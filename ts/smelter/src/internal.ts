// Internal surface consumed by @smelter-tpu/smelter-core — not public API.

export { SmelterContext } from './context/index.js';
export type { SmelterOutputContext } from './context/index.js';
export { OfflineTimeContext, LiveTimeContext } from './context/timeContext.js';
export type { TimeContext, BlockingTask } from './context/timeContext.js';
export { AudioContext } from './context/audioOutputContext.js';
export type { AudioConfig } from './context/audioOutputContext.js';
export {
  LiveInputStreamStore,
  OfflineInputStreamStore,
} from './context/inputStreamStore.js';
export type { InputStreamStore, InputStreamInfo, StreamState } from './context/inputStreamStore.js';
export type { SceneBuilder, SceneComponent } from './component.js';
export { sceneComponentIntoApi, DEFAULT_FONT_SIZE } from './component.js';
export { SmelterEventType } from './types/events.js';
export type { SmelterEvent, SmelterErrorSeverity } from './types/events.js';
export {
  inputRefIntoRawId,
  parseInputRef,
  assertGlobalInputId,
  OUTPUT_SPECIFIC_INPUT_TYPE,
} from './types/refs/inputRef.js';
export type { InputRef } from './types/refs/inputRef.js';
export {
  imageRefIntoRawId,
  parseImageRef,
  assertGlobalImageId,
  OUTPUT_SPECIFIC_IMAGE_TYPE,
} from './types/refs/imageRef.js';
export type { ImageRef } from './types/refs/imageRef.js';
export { areRefsEqual } from './types/refs/utils.js';
export {
  ChildrenLifetimeContext,
  ChildrenLifetimeContextType,
} from './context/childrenLifetimeContext.js';
export type { Logger } from './types/logger.js';
export { noopLogger } from './types/logger.js';
