import Smelter from './smelter/live.js';
import OfflineSmelter from './smelter/offline.js';
import RemoteInstanceManager, { type SmelterOptions } from './manager.js';

export default Smelter;
export { OfflineSmelter, RemoteInstanceManager };
export type { SmelterOptions };
