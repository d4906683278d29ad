export type { Logger } from '@smelter-tpu/smelter/internal';
export { noopLogger } from '@smelter-tpu/smelter/internal';
