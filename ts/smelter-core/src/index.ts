export { Smelter, OfflineSmelter, OFFLINE_OUTPUT_ID } from './facade.js';
export { ApiClient, Api } from './api.js';
export type {
  ApiRequest,
  MultipartRequest,
  RegisterInputResponse,
  RegisterOutputResponse,
  SetupInstanceOptions,
  SmelterManager,
} from './api.js';
export type { RegisterInput, RegisterInputRequest } from './api/input.js';
export { intoRegisterInput, inputRefIntoRawId, parseInputRef } from './api/input.js';
export type { RegisterOutput, RegisterOutputRequest } from './api/output.js';
export { intoRegisterOutput } from './api/output.js';
export { intoRegisterImage, intoRegisterWebRenderer } from './api/resources.js';
export { SceneTree } from './sceneTree.js';
export type { SceneRecord, SceneChild } from './sceneTree.js';
export { parseEvent, routeStreamEvent, SmelterEventType } from './events.js';
export type { SmelterEvent } from './events.js';
export { InputHandle, Mp4InputHandle, WhipInputHandle, newInputHandle } from './handles.js';
export type { Logger } from './logger.js';
export { noopLogger } from './logger.js';
export { JsonEventStream } from './eventStream.js';
export type { SocketAdapter, SocketHandlers, SocketLink } from './eventStream.js';
export { AccessGate, ActivityMonitor, SceneSync, sleep } from './updateFlow.js';
