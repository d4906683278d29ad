/**
 * Node live compositor. Thin facade over the core Smelter: supplies the
 * default locally-spawned server manager + pino logging, and serializes
 * init/terminate against in-flight registrations with an AccessGate —
 * registrations interleave freely with each other (shared mode) but never
 * with init/terminate (exclusive mode).
 */
import type { ReactElement } from 'react';
import type { Renderers } from '@smelter-tpu/smelter';
import type {
  InputHandle,
  Mp4InputHandle,
  SmelterManager,
  WhipInputHandle,
} from '@smelter-tpu/smelter-core';
import { AccessGate, Smelter as CoreSmelter } from '@smelter-tpu/smelter-core';
import type {
  RegisterInput,
  RegisterOutput,
  RegisterWhepServerOutputResponse,
} from '../api.js';
import { createLogger } from '../logger.js';
import LocallySpawnedInstanceManager from '../manager/locallySpawnedInstance.js';

export default class Smelter {
  private core: CoreSmelter;
  private gate = new AccessGate();

  public constructor(manager?: SmelterManager) {
    this.core = new CoreSmelter(
      manager ?? LocallySpawnedInstanceManager.defaultManager(),
      createLogger()
    );
  }

  // lifecycle transitions run exclusively
  public init = (): Promise<void> => this.gate.exclusively(() => this.core.init());
  public terminate = (): Promise<void> =>
    this.gate.exclusively(() => this.core.terminate());

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
  public registerWebRenderer = (
    instanceId: string,
    request: Renderers.RegisterWebRenderer
  ): Promise<void> => this.shared(c => c.registerWebRenderer(instanceId, request));
  public unregisterWebRenderer = (instanceId: string): Promise<void> =>
    this.shared(c => c.unregisterWebRenderer(instanceId));
  public start = (): Promise<void> => this.shared(c => c.start());

  public getInputById = (inputId: string): InputHandle | undefined =>
    this.core.getInputById(inputId);
  public stats = (): Promise<object> => this.core.stats();

  private async shared(fn: (core: CoreSmelter) => Promise<unknown>): Promise<void> {
    await this.gate.concurrently(() => fn(this.core));
  }
}
