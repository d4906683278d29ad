import type { SmelterManager } from '@smelter-tpu/smelter-core';
import Smelter from './live/compositor.js';
import OfflineSmelter from './offline/compositor.js';
import ExistingInstanceManager, {
  type ExistingInstanceOptions,
} from './manager/existingInstance.js';
import LocallySpawnedInstanceManager, {
  type LocallySpawnedInstanceOptions,
} from './manager/locallySpawnedInstance.js';

export * from './api.js';

export default Smelter;
export {
  OfflineSmelter,
  ExistingInstanceManager,
  LocallySpawnedInstanceManager,
};
export type {
  ExistingInstanceOptions,
  LocallySpawnedInstanceOptions,
  SmelterManager,
};
