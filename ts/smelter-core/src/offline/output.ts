/**
 * Offline output: steps the React tree timestamp-by-timestamp, sending
 * each rendered scene with its schedule_time_ms, until the content
 * finishes or durationMs is reached (AOT processing on the server side).
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
import { sleep } from '../utils.js';

export const OFFLINE_OUTPUT_ID = 'offline_output';

type AudioContext = _smelterInternals.AudioContext;
type OfflineTimeContext = _smelterInternals.OfflineTimeContext;
type OfflineInputStreamStore<Id> = _smelterInternals.OfflineInputStreamStore<Id>;
type SmelterOutputContext = _smelterInternals.SmelterOutputContext;
type ChildrenLifetimeContext = _smelterInternals.ChildrenLifetimeContext;

export default class OfflineOutput {
  api: ApiClient;
  outputId = OFFLINE_OUTPUT_ID;
  audioContext: AudioContext;
  timeContext: OfflineTimeContext;
  childrenLifetimeContext: ChildrenLifetimeContext;
  internalInputStreamStore: OfflineInputStreamStore<number>;
  logger: Logger;

  durationMs?: number;
  updateTracker?: UpdateTracker;

  supportsAudio: boolean;
  supportsVideo: boolean;

  renderer: Renderer;

  constructor(
    root: ReactElement,
    registerRequest: RegisterOutput,
    api: ApiClient,
    store: OfflineInputStreamStore<string>,
    logger: Logger,
    durationMs?: number
  ) {
    this.api = api;
    this.logger = logger;
    this.durationMs = durationMs;

    this.supportsAudio = 'audio' in registerRequest && !!registerRequest.audio;
    this.supportsVideo = 'video' in registerRequest && !!registerRequest.video;

    const onUpdate = () => this.updateTracker?.onUpdate();
    this.audioContext = new _smelterInternals.AudioContext(onUpdate);
    this.internalInputStreamStore = new _smelterInternals.OfflineInputStreamStore();
    this.timeContext = new _smelterInternals.OfflineTimeContext(
      onUpdate,
      (timestampMs: number) => {
        store.setCurrentTimestamp(timestampMs);
        this.internalInputStreamStore.setCurrentTimestamp(timestampMs);
      },
      logger
    );
    this.childrenLifetimeContext = new _smelterInternals.ChildrenLifetimeContext(
      () => undefined
    );

    const rootElement = createElement(OutputRootComponent, {
      outputContext: new OfflineOutputContext(this, this.outputId, store),
      outputRoot: root,
      childrenLifetimeContext: this.childrenLifetimeContext,
    });

    this.renderer = new Renderer({
      rootElement,
      onUpdate,
      idPrefix: `${this.outputId}-`,
      logger: logger.child({ element: 'react-renderer' }),
    });
  }

  public scene(): {
    video?: Api.VideoScene;
    audio?: Api.AudioScene;
    schedule_time_ms: number;
  } {
    const schedule_time_ms = this.timeContext.timestampMs();
    if (schedule_time_ms === Infinity) {
      throw new Error('Generating a scene without timestamp.');
    }
    return {
      video: this.supportsVideo ? { root: this.renderer.scene() } : undefined,
      audio: this.supportsAudio
        ? intoAudioInputsConfiguration(this.audioContext.getAudioConfig())
        : undefined,
      schedule_time_ms,
    };
  }

  /** Walk every timestamp, pushing scheduled scene updates. */
  public async scheduleAllUpdates(): Promise<void> {
    this.updateTracker = new UpdateTracker();

    while (this.timeContext.timestampMs() <= (this.durationMs ?? Infinity)) {
      for (;;) {
        await waitForBlockingTasks(this.timeContext);
        await this.updateTracker.waitForRenderEnd();
        if (!this.timeContext.isBlocked()) {
          break;
        }
      }

      const scene = this.scene();
      await this.api.updateScene(this.outputId, scene);

      const timestampMs = this.timeContext.timestampMs();
      if (this.childrenLifetimeContext.isDone() && this.durationMs === undefined) {
        await this.api.unregisterOutput(OFFLINE_OUTPUT_ID, {
          schedule_time_ms: timestampMs,
        });
        break;
      }
      this.timeContext.setNextTimestamp();
    }
    this.renderer.stop();
  }
}

async function waitForBlockingTasks(timeContext: OfflineTimeContext): Promise<void> {
  while (timeContext.isBlocked()) {
    await sleep(5);
  }
}

const RENDER_SETTLE_MS = 5;

/** Resolves once no React commit has landed for a few milliseconds. */
class UpdateTracker {
  private lastUpdate = Date.now();

  public onUpdate(): void {
    this.lastUpdate = Date.now();
  }

  public async waitForRenderEnd(): Promise<void> {
    for (;;) {
      const sinceLast = Date.now() - this.lastUpdate;
      if (sinceLast >= RENDER_SETTLE_MS) {
        return;
      }
      await sleep(RENDER_SETTLE_MS - sinceLast);
    }
  }
}

class OfflineOutputContext implements SmelterOutputContext {
  public readonly globalInputStreamStore: _smelterInternals.InputStreamStore<string>;
  public readonly internalInputStreamStore: OfflineInputStreamStore<number>;
  public readonly audioContext: AudioContext;
  public readonly timeContext: OfflineTimeContext;
  public readonly outputId: string;
  public readonly logger: Logger;
  private output: OfflineOutput;

  constructor(
    output: OfflineOutput,
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
    const inputRef = {
      type: _smelterInternals.OUTPUT_SPECIFIC_INPUT_TYPE,
      outputId: this.outputId,
      id: inputId,
    } as const;
    const offsetMs = this.timeContext.timestampMs();
    const response = await this.output.api.registerInput(inputRef, {
      type: 'mp4',
      url: request.url ?? undefined,
      path: request.serverPath ?? undefined,
      loop: request.loop ?? undefined,
      required: request.required ?? true,
      offset_ms: offsetMs,
      seek_ms: request.seekMs ?? undefined,
      decoder_map: request.decoderMap ?? undefined,
    } as Api.RegisterInput);
    this.internalInputStreamStore.addInput({
      inputId,
      offsetMs,
      videoDurationMs: request.loop ? Infinity : response.video_duration_ms,
      audioDurationMs: request.loop ? Infinity : response.audio_duration_ms,
      seekMs: request.seekMs ?? 0,
    });
    return {
      videoDurationMs: response.video_duration_ms,
      audioDurationMs: response.audio_duration_ms,
    };
  }

  public async unregisterMp4Input(inputId: number): Promise<void> {
    await this.output.api.unregisterInput(
      {
        type: _smelterInternals.OUTPUT_SPECIFIC_INPUT_TYPE,
        outputId: this.outputId,
        id: inputId,
      },
      { schedule_time_ms: this.timeContext.timestampMs() }
    );
  }

  public async registerImage(imageId: number, spec: Renderers.RegisterImage): Promise<void> {
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
