/**
 * Live compositor client ("Smelter"): registers inputs/outputs/resources
 * against a running server and keeps every output's React tree synced to
 * its scene. Outputs own their renderer + contexts (live/output.ts); this
 * class owns the shared pieces — the API client, the global input-stream
 * store, event routing, and the start clock.
 */
import type { Renderers } from '@smelter-tpu/smelter';
import { _smelterInternals } from '@smelter-tpu/smelter';
import type { ReactElement } from 'react';
import type { RegisterInputResponse, RegisterOutputResponse } from '../api.js';
import { ApiClient } from '../api.js';
import type { ImageRef } from '../api/refs.js';
import type { RegisterInput } from '../api/input.js';
import { intoRegisterInput } from '../api/input.js';
import type { RegisterOutput } from '../api/output.js';
import { intoRegisterOutput } from '../api/output.js';
import { intoRegisterImage, intoRegisterWebRenderer } from '../api/renderer.js';
import { parseEvent } from '../event.js';
import type { InputHandle } from '../handles.js';
import { newInputHandle } from '../handles.js';
import type { Logger } from '../logger.js';
import type { SmelterManager } from '../smelterManager.js';
import { handleEvent } from './event.js';
import Output from './output.js';

const globalRef = (id: string) => ({ type: 'global', id }) as const;
const globalImageRef = (id: string): ImageRef => ({ type: 'global', id });

export class Smelter {
  public readonly manager: SmelterManager;

  private api: ApiClient;
  private logger: Logger;
  private outputs = new Map<string, Output>();
  private inputs = new Map<string, InputHandle>();
  private store: _smelterInternals.LiveInputStreamStore<string>;
  private startTime?: number;

  public constructor(manager: SmelterManager, logger: Logger) {
    this.manager = manager;
    this.logger = logger;
    this.api = new ApiClient(manager);
    this.store = new _smelterInternals.LiveInputStreamStore(logger);
  }

  /** Connect, subscribe to events, and verify/prepare the instance. */
  public async init(): Promise<void> {
    this.manager.registerEventListener(raw => {
      const event = parseEvent(raw, this.logger);
      if (event) {
        this.logger.debug({ event }, 'server event');
        handleEvent(this.store, Object.fromEntries(this.outputs), event);
      }
    });
    await this.manager.setupInstance({
      aheadOfTimeProcessing: false,
      logger: this.logger.child({ element: 'connection-manager' }),
    });
  }

  /** Begin media processing; outputs' clocks anchor to this instant. */
  public async start(): Promise<void> {
    this.logger.info('start instance');
    const startedAt = Date.now();
    await this.api.start();
    this.startTime = startedAt;
    for (const output of this.outputs.values()) {
      output.initClock(startedAt);
    }
  }

  public async terminate(): Promise<void> {
    for (const output of this.outputs.values()) {
      await output.close();
    }
    await this.manager.terminate();
  }

  // ----------------------------------------------------------- outputs

  public async registerOutput(
    outputId: string,
    root: ReactElement,
    request: RegisterOutput
  ): Promise<RegisterOutputResponse> {
    this.logger.info({ outputId, type: request.type }, 'register output');
    const output = new Output(
      outputId, root, request, this.api, this.store, this.startTime, this.logger
    );
    const response = await this.api.registerOutput(
      outputId, intoRegisterOutput(request, output.scene())
    );
    this.outputs.set(outputId, output);
    await output.ready();
    if (request.type === 'whep_server' && !response.endpoint_route) {
      response.endpoint_route = `/whep/${encodeURIComponent(outputId)}`;
    }
    return response;
  }

  public async unregisterOutput(outputId: string): Promise<object> {
    this.logger.info({ outputId }, 'unregister output');
    await this.outputs.get(outputId)?.close();
    this.outputs.delete(outputId);
    return this.api.unregisterOutput(outputId, {});
  }

  // ------------------------------------------------------------ inputs

  public async registerInput(inputId: string, request: RegisterInput): Promise<InputHandle> {
    this.logger.info({ inputId, type: request.type }, 'register input');
    _smelterInternals.assertGlobalInputId(inputId);
    return this.store.runBlocking(async updateStore => {
      const response: RegisterInputResponse = await this.api.registerInput(
        globalRef(inputId), intoRegisterInput(request)
      );
      const handle = newInputHandle(globalRef(inputId), this.api, response, request.type);
      this.inputs.set(inputId, handle);
      updateStore({
        type: 'add_input',
        input: {
          inputId,
          videoDurationMs: response.video_duration_ms,
          audioDurationMs: response.audio_duration_ms,
        },
      });
      return handle;
    });
  }

  public async unregisterInput(inputId: string): Promise<object> {
    this.logger.info({ inputId }, 'unregister input');
    return this.store.runBlocking(async updateStore => {
      const pending = this.api.unregisterInput(globalRef(inputId), {});
      this.inputs.delete(inputId);
      updateStore({ type: 'remove_input', inputId });
      return pending;
    });
  }

  public getInputById(inputId: string): InputHandle | undefined {
    return this.inputs.get(inputId);
  }

  // --------------------------------------------------------- resources

  public async registerShader(shaderId: string, request: Renderers.RegisterShader) {
    this.logger.info({ shaderId }, 'register shader');
    return this.api.registerShader(shaderId, request);
  }

  public async unregisterShader(shaderId: string): Promise<object> {
    return this.api.unregisterShader(shaderId);
  }

  public async registerImage(imageId: string, request: Renderers.RegisterImage) {
    this.logger.info({ imageId }, 'register image');
    _smelterInternals.assertGlobalImageId(imageId);
    return this.api.registerImage(globalImageRef(imageId), intoRegisterImage(request));
  }

  public async unregisterImage(imageId: string): Promise<object> {
    return this.api.unregisterImage(globalImageRef(imageId), {});
  }

  public async registerWebRenderer(
    instanceId: string,
    request: Renderers.RegisterWebRenderer
  ): Promise<object> {
    this.logger.info({ instanceId }, 'register web renderer');
    return this.api.registerWebRenderer(instanceId, intoRegisterWebRenderer(request));
  }

  public async unregisterWebRenderer(instanceId: string): Promise<object> {
    return this.api.unregisterWebRenderer(instanceId);
  }

  public async stats(): Promise<object> {
    return this.api.stats();
  }
}
