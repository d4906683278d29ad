import type { ImageRef } from './imageRef.js';
import type { InputRef } from './inputRef.js';

export function areRefsEqual(a: InputRef | ImageRef, b: InputRef | ImageRef): boolean {
  if (a.type !== b.type) {
    return false;
  }
  if (a.type === 'global') {
    return a.id === b.id;
  }
  return a.id === (b as typeof a).id && a.outputId === (b as typeof a).outputId;
}
