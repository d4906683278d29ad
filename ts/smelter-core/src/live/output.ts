/**
 * Live output: owns the per-output React renderer + contexts and throttles
 * scene updates to the server (30 ms window, one request in flight).
 */
import type { Renderers } from '@smelter-tpu/smelter';
import { _smelterInternals } from '@smelter-tpu/smelter';
import type { RegisterMp4Input } from '@smelter-tpu/smelter';
import type { ReactElement } from 'react';
import { createElement } from 'react';
import type { Api, ApiClient } from '../api.js';
import type { ImageRef } from '../api/refs.js';
import type { RegisterOutput } from '../api/output.js';
import { intoAudioInputsConfiguration } from '../api/output.js';
import type { Logger } from '../logger.js';
import Renderer from '../renderer.js';
import { OutputRootComponent } from '../rootComponent.js';
import { ThrottledFunction } from '../utils.js';

type AudioContext = _smelterInternals.AudioContext;
type LiveTimeContext = _smelterInternals.LiveTimeContext;
type LiveInputStreamStore<Id> = _smelterInternals.LiveInputStreamStore<Id>;
type SmelterOutputContext = _smelterInternals.SmelterOutputContext;

export default class Output {
  api: ApiClient;
  outputId: string;
  audioContext: AudioContext;
  timeContext: LiveTimeContext;
  internalInputStreamStore: LiveInputStreamStore<number>;
  logger: Logger;

  shouldUpdateWhenReady = false;
  throttledUpdate: ThrottledFunction;

  supportsAudio: boolean;
  supportsVideo: boolean;

  renderer: Renderer;

  constructor(
    outputId: string,
    root: ReactElement,
    registerRequest: RegisterOutput,
    api: ApiClient,
    store: LiveInputStreamStore<string>,
    startTimestamp: number | undefined,
    logger: Logger
  ) {
    this.api = api;
    this.logger = logger;
    this.outputId = outputId;
    // until ready() swaps the fn in, updates only mark shouldUpdateWhenReady
    this.throttledUpdate = new ThrottledFunction(
      async () => {
        this.shouldUpdateWhenReady = true;
      },
      { timeoutMs: 30, logger: this.logger }
    );

    this.supportsAudio = 'audio' in registerRequest && !!registerRequest.audio;
    this.supportsVideo = 'video' in registerRequest && !!registerRequest.video;

    const onUpdate = () => this.throttledUpdate.scheduleCall();
    this.audioContext = new _smelterInternals.AudioContext(onUpdate);
    this.timeContext = new _smelterInternals.LiveTimeContext();
    this.internalInputStreamStore = new _smelterInternals.LiveInputStreamStore(logger);
    if (startTimestamp !== undefined) {
      this.timeContext.initClock(startTimestamp);
    }

    const rootElement = createElement(OutputRootComponent, {
      outputContext: new LiveOutputContext(this, outputId, store),
      outputRoot: root,
      childrenLifetimeContext: new _smelterInternals.ChildrenLifetimeContext(
        () => undefined
      ),
    });

    this.renderer = new Renderer({
      rootElement,
      onUpdate,
      idPrefix: `${outputId}-`,
      logger: logger.child({ element: 'react-renderer' }),
    });
  }

  public scene(): { video?: Api.VideoScene; audio?: Api.AudioScene } {
    return {
      video: this.supportsVideo ? { root: this.renderer.scene() } : undefined,
      audio: this.supportsAudio
        ? intoAudioInputsConfiguration(this.audioContext.getAudioConfig())
        : undefined,
    };
  }

  /** Start pushing scene updates (after registerOutput succeeded). */
  public async ready(): Promise<void> {
    this.throttledUpdate.setFn(async () => {
      await this.api.updateScene(this.outputId, this.scene());
    });
    if (this.shouldUpdateWhenReady) {
      this.throttledUpdate.scheduleCall();
    }
  }

  public async close(): Promise<void> {
    this.throttledUpdate.setFn(async () => undefined);
    this.renderer.stop();
    await this.throttledUpdate.waitForPendingCalls();
  }

  public initClock(timestamp: number): void {
    this.timeContext.initClock(timestamp);
  }

  public inputStreamStore(): LiveInputStreamStore<number> {
    return this.internalInputStreamStore;
  }
}

class LiveOutputContext implements SmelterOutputContext {
  public readonly globalInputStreamStore: _smelterInternals.InputStreamStore<string>;
  public readonly internalInputStreamStore: _smelterInternals.InputStreamStore<number>;
  public readonly audioContext: AudioContext;
  public readonly timeContext: LiveTimeContext;
  public readonly outputId: string;
  public readonly logger: Logger;
  private output: Output;

  constructor(
    output: Output,
    outputId: string,
    store: _smelterInternals.InputStreamStore<string>
  ) {
    this.output = output;
    this.globalInputStreamStore = store;
    this.internalInputStreamStore = output.internalInputStreamStore;
    this.audioContext = output.audioContext;
    this.timeContext = output.timeContext;
    this.outputId = outputId;
    this.logger = output.logger;
  }

  public async registerMp4Input(
    inputId: number,
    request: RegisterMp4Input
  ): Promise<{ videoDurationMs?: number; audioDurationMs?: number }> {
    return this.output.internalInputStreamStore.runBlocking(async updateStore => {
      const inputRef = {
        type: _smelterInternals.OUTPUT_SPECIFIC_INPUT_TYPE,
        outputId: this.outputId,
        id: inputId,
      } as const;
      const response = await this.output.api.registerInput(inputRef, {
        type: 'mp4',
        url: request.url ?? undefined,
        path: request.serverPath ?? undefined,
        loop: request.loop ?? undefined,
        required: request.required ?? undefined,
        offset_ms: request.offsetMs ?? undefined,
        seek_ms: request.seekMs ?? undefined,
        decoder_map: request.decoderMap ?? undefined,
      } as Api.RegisterInput);
      updateStore({
        type: 'add_input',
        input: {
          inputId,
          offsetMs: request.offsetMs,
          videoDurationMs: response.video_duration_ms,
          audioDurationMs: response.audio_duration_ms,
          seekMs: request.seekMs ?? 0,
        },
      });
      return {
        videoDurationMs: response.video_duration_ms,
        audioDurationMs: response.audio_duration_ms,
      };
    });
  }

  public async unregisterMp4Input(inputId: number): Promise<void> {
    await this.output.api.unregisterInput(
      {
        type: _smelterInternals.OUTPUT_SPECIFIC_INPUT_TYPE,
        outputId: this.outputId,
        id: inputId,
      },
      {}
    );
  }

  public async registerImage(
    imageId: number,
    spec: Renderers.RegisterImage
  ): Promise<void> {
    const imageRef = {
      type: _smelterInternals.OUTPUT_SPECIFIC_IMAGE_TYPE,
      outputId: this.outputId,
      id: imageId,
    } as const satisfies ImageRef;
    await this.output.api.registerImage(imageRef, {
      url: spec.url,
      path: spec.serverPath,
      asset_type: spec.assetType,
      resolution: spec.resolution,
    } as Api.ImageSpec);
  }

  public async unregisterImage(imageId: number): Promise<void> {
    await this.output.api.unregisterImage(
      {
        type: _smelterInternals.OUTPUT_SPECIFIC_IMAGE_TYPE,
        outputId: this.outputId,
        id: imageId,
      },
      {}
    );
  }
}
