/** Node-facing request/response aliases. */
export type { RegisterInput, RegisterOutput } from '@smelter-tpu/smelter-core';

export type RegisterWhepServerOutputResponse = {
  endpointRoute?: string;
};
