import { _smelterInternals } from '@smelter-tpu/smelter';

export type ImageRef = _smelterInternals.ImageRef;
export const imageRefIntoRawId = _smelterInternals.imageRefIntoRawId;
export const parseImageRef = _smelterInternals.parseImageRef;
