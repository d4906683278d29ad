// Internal surface consumed by @smelter-tpu/smelter-core — not public API.
// Everything here rides the SDK's own runtime model (reactive cells,
// keep-alive scopes, stream directories); see runtime.ts for the map.

export * from './reactive.js';
export * from './scene.js';
export * from './runtime.js';
export * from './lifecycle.js';
export * from './types/refs/inputRef.js';
export * from './types/refs/imageRef.js';
export { SmelterEventType } from './types/events.js';
export type { SmelterEvent, SmelterErrorSeverity } from './types/events.js';
export { noopLogger } from './types/logger.js';
export type { Logger } from './types/logger.js';
