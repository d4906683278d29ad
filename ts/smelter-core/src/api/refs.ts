/**
 * Re-exports of the ref helpers smelter-core uses to build request routes
 * (raw-id encodings live in the component package next to the components
 * that mint them).
 */
import { _smelterInternals } from '@smelter-tpu/smelter';

export type InputRef = _smelterInternals.InputRef;
export type ImageRef = _smelterInternals.ImageRef;

export const inputRefIntoRawId = _smelterInternals.inputRefIntoRawId;
export const parseInputRef = _smelterInternals.parseInputRef;
export const imageRefIntoRawId = _smelterInternals.imageRefIntoRawId;
export const parseImageRef = _smelterInternals.parseImageRef;
