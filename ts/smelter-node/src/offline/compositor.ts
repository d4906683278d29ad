/** Node offline compositor: core OfflineSmelter + local server manager. */
import type { ReactElement } from 'react';
import type { Renderers } from '@smelter-tpu/smelter';
import type { SmelterManager } from '@smelter-tpu/smelter-core';
import { OfflineSmelter as CoreOfflineSmelter } from '@smelter-tpu/smelter-core';
import type { RegisterInput, RegisterOutput } from '../api.js';
import { createLogger } from '../logger.js';
import LocallySpawnedInstanceManager from '../manager/locallySpawnedInstance.js';

export default class OfflineSmelter {
  private core: CoreOfflineSmelter;

  public constructor(manager?: SmelterManager) {
    this.core = new CoreOfflineSmelter(
      manager ?? LocallySpawnedInstanceManager.defaultManager(),
      createLogger()
    );
  }

  public async init(): Promise<void> {
    await this.core.init();
  }

  public async render(
    root: ReactElement,
    request: RegisterOutput,
    durationMs?: number
  ): Promise<void> {
    await this.core.render(root, request, durationMs);
  }

  public async registerInput(inputId: string, request: RegisterInput): Promise<object> {
    return this.core.registerInput(inputId, request);
  }

  public async registerShader(
    shaderId: string,
    request: Renderers.RegisterShader
  ): Promise<object> {
    return this.core.registerShader(shaderId, request);
  }

  public async registerImage(
    imageId: string,
    request: Renderers.RegisterImage
  ): Promise<object> {
    return this.core.registerImage(imageId, request);
  }
}
