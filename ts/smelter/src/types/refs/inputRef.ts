/**
 * Input identity. Either a globally registered input (registerInput) or an
 * input registered internally by a component like <Mp4 /> that only exists
 * for one output. Raw-id format must match the server-side convention the
 * reference established: "__output_specific_input:{n}:{outputId}".
 */
export const OUTPUT_SPECIFIC_INPUT_TYPE = '__output_specific_input' as const;
const PREFIX = `${OUTPUT_SPECIFIC_INPUT_TYPE}:`;

export type InputRef =
  | { type: 'global'; id: string }
  | { type: typeof OUTPUT_SPECIFIC_INPUT_TYPE; outputId: string; id: number };

export function inputRefIntoRawId(ref: InputRef): string {
  if (ref.type === 'global') {
    return ref.id;
  }
  return `${PREFIX}${ref.id}:${ref.outputId}`;
}

export function parseInputRef(rawId: string): InputRef {
  if (!rawId.startsWith(PREFIX)) {
    return { type: 'global', id: rawId };
  }
  const rest = rawId.slice(PREFIX.length);
  const sep = rest.indexOf(':');
  if (sep < 0) {
    throw new Error(`Invalid input ID. (${rawId})`);
  }
  return {
    type: OUTPUT_SPECIFIC_INPUT_TYPE,
    id: Number(rest.slice(0, sep)),
    outputId: rest.slice(sep + 1),
  };
}

export function assertGlobalInputId(id: string): void {
  if (id.startsWith(PREFIX)) {
    throw new Error(
      `Input id "${id}" is reserved: ids must not start with "${PREFIX}".`
    );
  }
}
