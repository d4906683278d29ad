let nextStreamId = 1;

/** Process-wide id allocator for output-specific input streams. */
export function newInternalStreamId(): number {
  return nextStreamId++;
}
