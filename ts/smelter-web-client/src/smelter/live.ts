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
import { AccessGate, Smelter as CoreSmelter } from '@smelter-tpu/smelter-core';
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
  private gate = new AccessGate();

  public constructor(opts: SmelterOptions) {
    this.core = new CoreSmelter(new RemoteInstanceManager(opts), browserLogger());
  }

  // lifecycle transitions run exclusively
  public init = (): Promise<void> => this.gate.exclusively(() => this.core.init());
  public terminate = (): Promise<void> =>
    this.gate.exclusively(() => this.core.terminate());

  public async registerOutput(
    outputId: string,
    root: ReactElement,
    request: RegisterOutput
  ): Promise<object> {
    return this.gate.concurrently(async () => {
      const result = await this.core.registerOutput(outputId, root, request);
      return request.type === 'whep_server'
        ? { endpointRoute: result.endpoint_route }
        : result;
    });
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
    return this.gate.concurrently(() => this.core.registerInput(inputId, request));
  }

  // remaining resource verbs: shared-mode pass-through to the core
  public unregisterOutput = (outputId: string): Promise<void> =>
    this.shared(c => c.unregisterOutput(outputId));
  public unregisterInput = (inputId: string): Promise<void> =>
    this.shared(c => c.unregisterInput(inputId));
  public registerShader = (shaderId: string, request: Renderers.RegisterShader): Promise<void> =>
    this.shared(c => c.registerShader(shaderId, request));
  public unregisterShader = (shaderId: string): Promise<void> =>
    this.shared(c => c.unregisterShader(shaderId));
  public registerImage = (imageId: string, request: Renderers.RegisterImage): Promise<void> =>
    this.shared(c => c.registerImage(imageId, request));
  public unregisterImage = (imageId: string): Promise<void> =>
    this.shared(c => c.unregisterImage(imageId));
  public start = (): Promise<void> => this.shared(c => c.start());

  public getInputById = (inputId: string): InputHandle | undefined =>
    this.core.getInputById(inputId);
  public stats = (): Promise<object> => this.core.stats();

  private async shared(fn: (core: CoreSmelter) => Promise<unknown>): Promise<void> {
    await this.gate.concurrently(() => fn(this.core));
  }
}
