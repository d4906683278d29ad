/**
 * Offline compositor client: register everything up front, then render()
 * walks the timeline (AOT server mode) and resolves when OUTPUT_DONE
 * arrives for the offline output.
 */
import type { Renderers } from '@smelter-tpu/smelter';
import { _smelterInternals } from '@smelter-tpu/smelter';
import type { ReactElement } from 'react';
import type { RegisterInputResponse } from '../api.js';
import { ApiClient } from '../api.js';
import type { ImageRef } from '../api/refs.js';
import type { RegisterInput } from '../api/input.js';
import { intoRegisterInput } from '../api/input.js';
import type { RegisterOutput } from '../api/output.js';
import { intoRegisterOutput } from '../api/output.js';
import { intoRegisterImage } from '../api/renderer.js';
import { parseEvent, SmelterEventType } from '../event.js';
import type { Logger } from '../logger.js';
import type { SmelterManager } from '../smelterManager.js';
import OfflineOutput, { OFFLINE_OUTPUT_ID } from './output.js';

export { OFFLINE_OUTPUT_ID };

export class OfflineSmelter {
  public readonly manager: SmelterManager;
  private api: ApiClient;
  private store: _smelterInternals.OfflineInputStreamStore<string>;
  private renderStarted = false;
  private inputTimestamps: number[] = [];
  private logger: Logger;

  public constructor(manager: SmelterManager, logger: Logger) {
    this.manager = manager;
    this.api = new ApiClient(manager);
    this.store = new _smelterInternals.OfflineInputStreamStore();
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

    const output = new OfflineOutput(
      root, request, this.api, this.store, this.logger, durationMs
    );
    for (const timestamp of this.inputTimestamps) {
      output.timeContext.addTimestamp({ timestamp });
    }
    const apiRequest = intoRegisterOutput(request, output.scene());
    await this.api.registerOutput(OFFLINE_OUTPUT_ID, apiRequest);
    await output.scheduleAllUpdates();
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
    _smelterInternals.assertGlobalInputId(inputId);

    const inputRef = { type: 'global', id: inputId } as const;
    const result = await this.api.registerInput(inputRef, intoRegisterInput(request));

    const offsetMs =
      'offsetMs' in request && request.offsetMs ? request.offsetMs : 0;
    if (request.type === 'mp4' && request.loop) {
      this.store.addInput({
        inputId,
        offsetMs,
        videoDurationMs: Infinity,
        audioDurationMs: Infinity,
      });
      return result;
    }
    const seekMs = request.type === 'mp4' ? (request.seekMs ?? 0) : 0;
    this.store.addInput({
      inputId,
      offsetMs,
      videoDurationMs: result.video_duration_ms,
      audioDurationMs: result.audio_duration_ms,
      seekMs,
    });
    if (offsetMs) {
      this.inputTimestamps.push(offsetMs);
    }
    if (result.video_duration_ms) {
      this.inputTimestamps.push(
        offsetMs + Math.max(0, result.video_duration_ms - seekMs)
      );
    }
    if (result.audio_duration_ms) {
      this.inputTimestamps.push(
        offsetMs + Math.max(0, result.audio_duration_ms - seekMs)
      );
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
    _smelterInternals.assertGlobalImageId(imageId);
    const imageRef = { type: 'global', id: imageId } as const satisfies ImageRef;
    return this.api.registerImage(imageRef, intoRegisterImage(request));
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
