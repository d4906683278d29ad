/** Browser offline compositor client. */
import type { ReactElement } from 'react';
import { pino } from 'pino';
import type { Renderers } from '@smelter-tpu/smelter';
import type { RegisterInput, RegisterOutput } from '@smelter-tpu/smelter-core';
import { OfflineSmelter as CoreOfflineSmelter } from '@smelter-tpu/smelter-core';
import type { SmelterOptions } from '../manager.js';
import RemoteInstanceManager from '../manager.js';

export default class OfflineSmelter {
  private core: CoreOfflineSmelter;

  public constructor(opts: SmelterOptions) {
    const logger = pino({ level: 'warn', browser: { asObject: true } });
    this.core = new CoreOfflineSmelter(
      new RemoteInstanceManager(opts),
      logger as unknown as ConstructorParameters<typeof CoreOfflineSmelter>[1]
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
