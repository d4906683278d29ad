/**
 * Offline output driver: steps the scene tree mark-to-mark along the
 * timeline, sending each serialized scene with its schedule_time_ms (AOT
 * processing on the server side) until content finishes or durationMs.
 */
import { createElement } from 'react';
import type { ReactElement } from 'react';
import type { Api } from '@smelter-tpu/smelter';
import { _smelterInternals as sm } from '@smelter-tpu/smelter';
import type { ApiClient } from '../api.js';
import type { RegisterOutput } from '../api/output.js';
import type { Logger } from '../logger.js';
import { SceneTree } from '../sceneTree.js';
import { ActivityMonitor, sleep } from '../updateFlow.js';

export const OFFLINE_OUTPUT_ID = 'offline_output';

/** A React render cascade is considered settled after this much quiet. */
const SETTLE_MS = 5;

export type OfflineOutputOptions = {
  element: ReactElement;
  request: RegisterOutput;
  api: ApiClient;
  sharedStreams: sm.TimelineStreamDirectory<string>;
  /** Timeline points of interest known up front (input offsets/EOS). */
  timelineMarks: number[];
  logger: Logger;
  durationMs?: number;
};

export class OfflineOutput {
  public readonly outputId = OFFLINE_OUTPUT_ID;
  public readonly runtime: sm.OutputRuntime;
  private readonly clock: sm.SteppedClock;
  private readonly scoped: sm.TimelineStreamDirectory<number>;
  private readonly tree: SceneTree;
  private readonly monitor = new ActivityMonitor();
  private readonly api: ApiClient;
  private readonly hasVideo: boolean;
  private readonly hasAudio: boolean;
  private readonly durationMs?: number;

  constructor(options: OfflineOutputOptions) {
    const { api, logger } = options;
    this.api = api;
    this.durationMs = options.durationMs;
    this.hasVideo = 'video' in options.request && !!options.request.video;
    this.hasAudio = 'audio' in options.request && !!options.request.audio;

    this.clock = new sm.SteppedClock();
    this.clock.onReleased = () => this.monitor.touch();
    for (const mark of options.timelineMarks) {
      this.clock.markInterest(mark);
    }
    options.sharedStreams.bindClock(this.clock);
    this.scoped = new sm.TimelineStreamDirectory<number>();
    this.scoped.bindClock(this.clock);

    this.runtime = new sm.OutputRuntime({
      outputId: this.outputId,
      clock: this.clock,
      sharedStreams: options.sharedStreams,
      scopedStreams: this.scoped,
      services: this.services(),
      offline: true,
      log: logger,
    });
    this.runtime.mixer.version.watch(() => this.monitor.touch());

    this.tree = new SceneTree(
      createElement(sm.OutputShell, { runtime: this.runtime }, options.element),
      {
        onCommit: () => this.monitor.touch(),
        logger: logger.child({ element: 'scene-tree' }),
      }
    );
  }

  /** Wire scene scheduled at the current step. */
  public captureScene(): {
    video?: Api.VideoScene;
    audio?: Api.AudioScene;
    schedule_time_ms: number;
  } {
    return {
      video: this.hasVideo ? { root: this.tree.snapshot() } : undefined,
      audio: this.hasAudio ? { inputs: this.runtime.mixer.snapshot() } : undefined,
      schedule_time_ms: this.clock.now(),
    };
  }

  /**
   * Walk the timeline: settle (no pending registrations, React quiet),
   * push the scheduled scene, stop on content EOS or durationMs.
   */
  public async run(): Promise<void> {
    try {
      for (;;) {
        await this.settle();
        await this.api.updateScene(this.outputId, this.captureScene());

        const stepMs = this.clock.now();
        if (this.durationMs === undefined && this.runtime.keepAlive.idle()) {
          await this.api.unregisterOutput(this.outputId, {
            schedule_time_ms: stepMs,
          });
          break;
        }
        if (!this.clock.advance()) {
          break;
        }
        if (this.clock.now() > (this.durationMs ?? Infinity)) {
          break;
        }
      }
    } finally {
      this.tree.unmount();
    }
  }

  private async settle(): Promise<void> {
    for (;;) {
      while (this.clock.isHeld()) {
        await sleep(SETTLE_MS);
      }
      await this.monitor.quiet(SETTLE_MS);
      if (!this.clock.isHeld()) {
        return;
      }
    }
  }

  private services(): sm.OutputServices {
    return {
      addMp4Source: async (handle, spec) => {
        const ref = {
          type: sm.OUTPUT_SPECIFIC_INPUT_TYPE,
          outputId: this.outputId,
          id: handle,
        } as const;
        const offsetMs = this.clock.now();
        const response = await this.api.registerInput(ref, {
          type: 'mp4',
          url: spec.url ?? undefined,
          path: spec.serverPath ?? undefined,
          loop: spec.loop ?? undefined,
          required: spec.required ?? true,
          offset_ms: offsetMs,
          seek_ms: spec.seekMs ?? undefined,
          decoder_map: spec.decoderMap ?? undefined,
        } as Api.RegisterInput);
        this.scoped.track({
          inputId: handle,
          offsetMs,
          videoDurationMs: spec.loop ? Infinity : response.video_duration_ms,
          audioDurationMs: spec.loop ? Infinity : response.audio_duration_ms,
          seekMs: spec.seekMs ?? 0,
        });
        return {
          videoDurationMs: response.video_duration_ms,
          audioDurationMs: response.audio_duration_ms,
        };
      },
      removeMp4Source: async handle => {
        await this.api.unregisterInput(
          {
            type: sm.OUTPUT_SPECIFIC_INPUT_TYPE,
            outputId: this.outputId,
            id: handle,
          },
          { schedule_time_ms: this.clock.now() }
        );
      },
      addImageAsset: async (handle, spec) => {
        await this.api.registerImage(
          {
            type: sm.OUTPUT_SPECIFIC_IMAGE_TYPE,
            outputId: this.outputId,
            id: handle,
          },
          {
            url: spec.url,
            path: spec.serverPath,
            asset_type: spec.assetType,
            resolution: spec.resolution,
          } as Api.ImageSpec
        );
      },
      removeImageAsset: async handle => {
        await this.api.unregisterImage(
          {
            type: sm.OUTPUT_SPECIFIC_IMAGE_TYPE,
            outputId: this.outputId,
            id: handle,
          },
          {}
        );
      },
    };
  }
}
