/**
 * Image identity — global (registerImage) or registered internally by
 * <Image source=...> for one output. Raw-id convention mirrors inputRef:
 * "__output_specific_image:{n}:{outputId}".
 */
export const OUTPUT_SPECIFIC_IMAGE_TYPE = '__output_specific_image' as const;
const PREFIX = `${OUTPUT_SPECIFIC_IMAGE_TYPE}:`;

export type ImageRef =
  | { type: 'global'; id: string }
  | { type: typeof OUTPUT_SPECIFIC_IMAGE_TYPE; outputId: string; id: number };

export function imageRefIntoRawId(ref: ImageRef): string {
  if (ref.type === 'global') {
    return ref.id;
  }
  return `${PREFIX}${ref.id}:${ref.outputId}`;
}

export function parseImageRef(rawId: string): ImageRef {
  if (!rawId.startsWith(PREFIX)) {
    return { type: 'global', id: rawId };
  }
  const rest = rawId.slice(PREFIX.length);
  const sep = rest.indexOf(':');
  if (sep < 0) {
    throw new Error(`Invalid image ID. (${rawId})`);
  }
  return {
    type: OUTPUT_SPECIFIC_IMAGE_TYPE,
    id: Number(rest.slice(0, sep)),
    outputId: rest.slice(sep + 1),
  };
}

export function assertGlobalImageId(id: string): void {
  if (id.startsWith(PREFIX)) {
    throw new Error(
      `Image id "${id}" is reserved: ids must not start with "${PREFIX}".`
    );
  }
}
