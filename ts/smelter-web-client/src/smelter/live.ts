/** Browser live compositor client: core Smelter over the remote manager. */
import type { ReactElement } from 'react';
import { pino } from 'pino';
import type { Renderers } from '@smelter-tpu/smelter';
import type {
  InputHandle,
  Mp4InputHandle,
  RegisterInput,
  RegisterOutput,
  WhipInputHandle,
} from '@smelter-tpu/smelter-core';
import { Smelter as CoreSmelter, StateGuard } from '@smelter-tpu/smelter-core';
import type { SmelterOptions } from '../manager.js';
import RemoteInstanceManager from '../manager.js';

function browserLogger() {
  return pino({
    level: 'warn',
    browser: { asObject: true },
  }) as unknown as ConstructorParameters<typeof CoreSmelter>[1];
}

export default class Smelter {
  private core: CoreSmelter;
  private scheduler = new StateGuard();

  public constructor(opts: SmelterOptions) {
    this.core = new CoreSmelter(new RemoteInstanceManager(opts), browserLogger());
  }

  public async init(): Promise<void> {
    await this.scheduler.runBlocking(() => this.core.init());
  }

  public async registerOutput(
    outputId: string,
    root: ReactElement,
    request: RegisterOutput
  ): Promise<object> {
    return this.scheduler.run(async () => {
      const result = await this.core.registerOutput(outputId, root, request);
      if (request.type === 'whep_server') {
        return { endpointRoute: result.endpoint_route };
      }
      return result;
    });
  }

  public async unregisterOutput(outputId: string): Promise<void> {
    await this.scheduler.run(() => this.core.unregisterOutput(outputId));
  }

  public async registerInput(
    inputId: string,
    request: Extract<RegisterInput, { type: 'whip_server' }>
  ): Promise<WhipInputHandle>;
  public async registerInput(
    inputId: string,
    request: Extract<RegisterInput, { type: 'mp4' }>
  ): Promise<Mp4InputHandle>;
  public async registerInput(
    inputId: string,
    request: RegisterInput
  ): Promise<InputHandle>;
  public async registerInput(
    inputId: string,
    request: RegisterInput
  ): Promise<InputHandle> {
    return this.scheduler.run(() => this.core.registerInput(inputId, request));
  }

  public getInputById(inputId: string): InputHandle | undefined {
    return this.core.getInputById(inputId);
  }

  public async unregisterInput(inputId: string): Promise<void> {
    await this.scheduler.run(() => this.core.unregisterInput(inputId));
  }

  public async registerShader(
    shaderId: string,
    request: Renderers.RegisterShader
  ): Promise<void> {
    await this.scheduler.run(() => this.core.registerShader(shaderId, request));
  }

  public async unregisterShader(shaderId: string): Promise<void> {
    await this.scheduler.run(() => this.core.unregisterShader(shaderId));
  }

  public async registerImage(
    imageId: string,
    request: Renderers.RegisterImage
  ): Promise<void> {
    await this.scheduler.run(() => this.core.registerImage(imageId, request));
  }

  public async unregisterImage(imageId: string): Promise<void> {
    await this.scheduler.run(() => this.core.unregisterImage(imageId));
  }

  public async start(): Promise<void> {
    await this.scheduler.run(() => this.core.start());
  }

  public async terminate(): Promise<void> {
    await this.scheduler.runBlocking(() => this.core.terminate());
  }

  public async stats(): Promise<object> {
    return this.core.stats();
  }
}
