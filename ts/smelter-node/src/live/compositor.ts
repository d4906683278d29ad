/**
 * Node live compositor. Thin facade over the core Smelter: supplies the
 * default locally-spawned server manager + pino logging, and serializes
 * init/terminate against in-flight registrations with a StateGuard.
 * Resource methods all delegate through the guard's shared mode so
 * concurrent registrations interleave freely with each other but never
 * with init/terminate.
 */
import type { ReactElement } from 'react';
import type { Renderers } from '@smelter-tpu/smelter';
import type {
  InputHandle,
  Mp4InputHandle,
  SmelterManager,
  WhipInputHandle,
} from '@smelter-tpu/smelter-core';
import { Smelter as CoreSmelter, StateGuard } from '@smelter-tpu/smelter-core';
import type {
  RegisterInput,
  RegisterOutput,
  RegisterWhepServerOutputResponse,
} from '../api.js';
import { createLogger } from '../logger.js';
import LocallySpawnedInstanceManager from '../manager/locallySpawnedInstance.js';

export default class Smelter {
  private core: CoreSmelter;
  private scheduler = new StateGuard();

  public constructor(manager?: SmelterManager) {
    this.core = new CoreSmelter(
      manager ?? LocallySpawnedInstanceManager.defaultManager(),
      createLogger()
    );
  }

  /** Shared-mode delegation: interleaves with other calls, not with init. */
  private guarded<T>(fn: () => Promise<T>): Promise<T> {
    return this.scheduler.run(fn);
  }

  public async init(): Promise<void> {
    await this.scheduler.runBlocking(() => this.core.init());
  }

  public async registerOutput(
    outputId: string,
    root: ReactElement,
    request: Extract<RegisterOutput, { type: 'whep_server' }>
  ): Promise<RegisterWhepServerOutputResponse>;
  public async registerOutput(
    outputId: string,
    root: ReactElement,
    request: RegisterOutput
  ): Promise<object>;
  public async registerOutput(
    outputId: string,
    root: ReactElement,
    request: RegisterOutput
  ): Promise<object> {
    return this.guarded(async () => {
      const result = await this.core.registerOutput(outputId, root, request);
      if (request.type === 'whep_server') {
        return { endpointRoute: result.endpoint_route };
      }
      return result;
    });
  }

  public async unregisterOutput(outputId: string): Promise<void> {
    await this.guarded(() => this.core.unregisterOutput(outputId));
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
    return this.guarded(() => this.core.registerInput(inputId, request));
  }

  public getInputById(inputId: string): InputHandle | undefined {
    return this.core.getInputById(inputId);
  }

  public async unregisterInput(inputId: string): Promise<void> {
    await this.guarded(() => this.core.unregisterInput(inputId));
  }

  public async registerShader(
    shaderId: string,
    request: Renderers.RegisterShader
  ): Promise<void> {
    await this.guarded(() => this.core.registerShader(shaderId, request));
  }

  public async unregisterShader(shaderId: string): Promise<void> {
    await this.guarded(() => this.core.unregisterShader(shaderId));
  }

  public async registerImage(
    imageId: string,
    request: Renderers.RegisterImage
  ): Promise<void> {
    await this.guarded(() => this.core.registerImage(imageId, request));
  }

  public async unregisterImage(imageId: string): Promise<void> {
    await this.guarded(() => this.core.unregisterImage(imageId));
  }

  public async registerWebRenderer(
    instanceId: string,
    request: Renderers.RegisterWebRenderer
  ): Promise<void> {
    await this.guarded(() => this.core.registerWebRenderer(instanceId, request));
  }

  public async unregisterWebRenderer(instanceId: string): Promise<void> {
    await this.guarded(() => this.core.unregisterWebRenderer(instanceId));
  }

  public async start(): Promise<void> {
    await this.guarded(() => this.core.start());
  }

  public async terminate(): Promise<void> {
    await this.scheduler.runBlocking(() => this.core.terminate());
  }

  public async stats(): Promise<object> {
    return this.core.stats();
  }
}
