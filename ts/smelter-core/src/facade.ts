/**
 * The two client facades:
 *
 * - `Smelter` (live): registers inputs/outputs/resources against a running
 *   server and keeps every output's React tree synced to its scene.
 * - `OfflineSmelter`: registers everything up front, then `render()` walks
 *   the timeline (server AOT mode) and resolves on OUTPUT_DONE.
 *
 * Both speak through a SmelterManager transport provided by the
 * environment package (node / web client).
 */
import type { Renderers } from '@smelter-tpu/smelter';
import { _smelterInternals as sm } from '@smelter-tpu/smelter';
import type { ReactElement } from 'react';
import type { RegisterInputResponse, RegisterOutputResponse } from './api.js';
import { ApiClient } from './api.js';
import type { RegisterInput } from './api/input.js';
import { intoRegisterInput } from './api/input.js';
import type { RegisterOutput } from './api/output.js';
import { intoRegisterOutput } from './api/output.js';
import { intoRegisterImage, intoRegisterWebRenderer } from './api/resources.js';
import { parseEvent, routeStreamEvent, SmelterEventType } from './events.js';
import type { InputHandle } from './handles.js';
import { newInputHandle } from './handles.js';
import type { Logger } from './logger.js';
import { LiveOutput } from './output/live.js';
import { OFFLINE_OUTPUT_ID, OfflineOutput } from './output/offline.js';
import type { SmelterManager } from './api.js';

export { OFFLINE_OUTPUT_ID };

const globalRef = (id: string) => ({ type: 'global', id }) as const;

export class Smelter {
  public readonly manager: SmelterManager;

  private api: ApiClient;
  private logger: Logger;
  private outputs = new Map<string, LiveOutput>();
  private inputs = new Map<string, InputHandle>();
  private streams: sm.LiveStreamDirectory<string>;
  private startTime?: number;

  public constructor(manager: SmelterManager, logger: Logger) {
    this.manager = manager;
    this.logger = logger;
    this.api = new ApiClient(manager);
    this.streams = new sm.LiveStreamDirectory(logger);
  }

  /** Connect, subscribe to events, and verify/prepare the instance. */
  public async init(): Promise<void> {
    this.manager.registerEventListener(raw => {
      const event = parseEvent(raw, this.logger);
      if (event) {
        this.logger.debug({ event }, 'server event');
        routeStreamEvent(this.streams, this.outputs, event);
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
      output.anchorClock(startedAt);
    }
  }

  public async terminate(): Promise<void> {
    for (const output of this.outputs.values()) {
      await output.shutdown();
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
    const output = new LiveOutput({
      outputId,
      element: root,
      request,
      api: this.api,
      sharedStreams: this.streams,
      anchorMs: this.startTime,
      logger: this.logger,
    });
    const response = await this.api.registerOutput(
      outputId,
      intoRegisterOutput(request, output.captureScene())
    );
    this.outputs.set(outputId, output);
    output.activate();
    if (request.type === 'whep_server' && !response.endpoint_route) {
      response.endpoint_route = `/whep/${encodeURIComponent(outputId)}`;
    }
    return response;
  }

  public async unregisterOutput(outputId: string): Promise<object> {
    this.logger.info({ outputId }, 'unregister output');
    await this.outputs.get(outputId)?.shutdown();
    this.outputs.delete(outputId);
    return this.api.unregisterOutput(outputId, {});
  }

  // ------------------------------------------------------------ inputs

  public async registerInput(inputId: string, request: RegisterInput): Promise<InputHandle> {
    this.logger.info({ inputId, type: request.type }, 'register input');
    sm.assertGlobalInputId(inputId);
    return this.streams.locked(async dir => {
      const response: RegisterInputResponse = await this.api.registerInput(
        globalRef(inputId),
        intoRegisterInput(request)
      );
      const handle = newInputHandle(globalRef(inputId), this.api, response, request.type);
      this.inputs.set(inputId, handle);
      dir.insert({
        inputId,
        videoDurationMs: response.video_duration_ms,
        audioDurationMs: response.audio_duration_ms,
      });
      return handle;
    });
  }

  public async unregisterInput(inputId: string): Promise<object> {
    this.logger.info({ inputId }, 'unregister input');
    return this.streams.locked(async dir => {
      const pending = this.api.unregisterInput(globalRef(inputId), {});
      this.inputs.delete(inputId);
      dir.forget(inputId);
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
    sm.assertGlobalImageId(imageId);
    return this.api.registerImage(
      { type: 'global', id: imageId },
      intoRegisterImage(request)
    );
  }

  public async unregisterImage(imageId: string): Promise<object> {
    return this.api.unregisterImage({ type: 'global', id: imageId }, {});
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

export class OfflineSmelter {
  public readonly manager: SmelterManager;
  private api: ApiClient;
  private streams: sm.TimelineStreamDirectory<string>;
  private timelineMarks: number[] = [];
  private renderStarted = false;
  private logger: Logger;

  public constructor(manager: SmelterManager, logger: Logger) {
    this.manager = manager;
    this.api = new ApiClient(manager);
    this.streams = new sm.TimelineStreamDirectory();
    this.logger = logger;
  }

  public async init(): Promise<void> {
    this.checkNotStarted();
    await this.manager.setupInstance({
      aheadOfTimeProcessing: true,
      logger: this.logger.child({ element: 'connection-manager' }),
    });
  }

  public async render(
    root: ReactElement,
    request: RegisterOutput,
    durationMs?: number
  ): Promise<void> {
    this.checkNotStarted();
    this.renderStarted = true;

    const output = new OfflineOutput({
      element: root,
      request,
      api: this.api,
      sharedStreams: this.streams,
      timelineMarks: this.timelineMarks,
      logger: this.logger,
      durationMs,
    });
    await this.api.registerOutput(
      OFFLINE_OUTPUT_ID,
      intoRegisterOutput(request, output.captureScene())
    );
    await output.run();
    if (durationMs) {
      await this.api.unregisterOutput(OFFLINE_OUTPUT_ID, {
        schedule_time_ms: durationMs,
      });
    }

    const done = new Promise<void>(resolve => {
      this.manager.registerEventListener(raw => {
        const event = parseEvent(raw, this.logger);
        if (
          event &&
          event.type === SmelterEventType.OUTPUT_DONE &&
          event.outputId === OFFLINE_OUTPUT_ID
        ) {
          resolve();
        }
      });
    });

    await this.api.start();
    await done;
    await this.manager.terminate();
  }

  public async registerInput(
    inputId: string,
    request: RegisterInput
  ): Promise<RegisterInputResponse> {
    this.checkNotStarted();
    this.logger.info({ inputId, type: request.type }, 'Register new input');
    sm.assertGlobalInputId(inputId);

    const result = await this.api.registerInput(
      globalRef(inputId),
      intoRegisterInput(request)
    );

    const offsetMs = 'offsetMs' in request && request.offsetMs ? request.offsetMs : 0;
    const loops = request.type === 'mp4' && !!request.loop;
    const seekMs = request.type === 'mp4' ? (request.seekMs ?? 0) : 0;
    this.streams.track({
      inputId,
      offsetMs,
      videoDurationMs: loops ? Infinity : result.video_duration_ms,
      audioDurationMs: loops ? Infinity : result.audio_duration_ms,
      seekMs,
    });
    if (!loops) {
      // points of interest: when the input starts and when each track ends
      if (offsetMs) {
        this.timelineMarks.push(offsetMs);
      }
      for (const durationMs of [result.video_duration_ms, result.audio_duration_ms]) {
        if (durationMs) {
          this.timelineMarks.push(offsetMs + Math.max(0, durationMs - seekMs));
        }
      }
    }
    return result;
  }

  public async registerShader(
    shaderId: string,
    request: Renderers.RegisterShader
  ): Promise<object> {
    this.checkNotStarted();
    this.logger.info({ shaderId }, 'Register shader');
    return this.api.registerShader(shaderId, request);
  }

  public async registerImage(imageId: string, request: Renderers.RegisterImage): Promise<object> {
    this.checkNotStarted();
    this.logger.info({ imageId }, 'Register image');
    sm.assertGlobalImageId(imageId);
    return this.api.registerImage(
      { type: 'global', id: imageId },
      intoRegisterImage(request)
    );
  }

  public async stats(): Promise<object> {
    return this.api.stats();
  }

  private checkNotStarted(): void {
    if (this.renderStarted) {
      throw new Error('Render was already started.');
    }
  }
}
