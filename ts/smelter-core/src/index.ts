export { Smelter } from './live/compositor.js';
export { OfflineSmelter, OFFLINE_OUTPUT_ID } from './offline/compositor.js';
export { ApiClient, Api } from './api.js';
export type {
  ApiRequest,
  MultipartRequest,
  RegisterInputResponse,
  RegisterOutputResponse,
} from './api.js';
export type { RegisterInput, RegisterInputRequest } from './api/input.js';
export { intoRegisterInput, inputRefIntoRawId, parseInputRef } from './api/input.js';
export type { RegisterOutput, RegisterOutputRequest } from './api/output.js';
export { intoRegisterOutput, intoAudioInputsConfiguration } from './api/output.js';
export { intoRegisterImage, intoRegisterWebRenderer } from './api/renderer.js';
export type {
  SmelterManager,
  SetupInstanceOptions,
} from './smelterManager.js';
export { default as Renderer, HostComponent } from './renderer.js';
export { parseEvent, SmelterEventType } from './event.js';
export type { SmelterEvent } from './event.js';
export { InputHandle, Mp4InputHandle, WhipInputHandle, newInputHandle } from './handles.js';
export type { Logger } from './logger.js';
export { noopLogger } from './logger.js';
export { ThrottledFunction, StateGuard, sleep } from './utils.js';
