export * from './api.js';

export { default } from './live/compositor.js';
export { default as OfflineSmelter } from './offline/compositor.js';
export {
  default as ExistingInstanceManager,
  type ExistingInstanceOptions,
} from './manager/existingInstance.js';
export {
  default as LocallySpawnedInstanceManager,
  type LocallySpawnedInstanceOptions,
} from './manager/locallySpawnedInstance.js';
export type { SmelterManager } from '@smelter-tpu/smelter-core';
