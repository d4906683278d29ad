let nextImageId = 1;

/** Process-wide id allocator for output-specific images. */
export function newInternalImageId(): number {
  return nextImageId++;
}
