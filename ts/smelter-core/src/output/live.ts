/**
 * Live output driver: owns the mounted scene tree + per-output runtime and
 * pushes throttled scene updates to the server while React commits land.
 */
import { createElement } from 'react';
import type { ReactElement } from 'react';
import type { Api } from '@smelter-tpu/smelter';
import { _smelterInternals as sm } from '@smelter-tpu/smelter';
import type { ApiClient } from '../api.js';
import type { RegisterOutput } from '../api/output.js';
import type { Logger } from '../logger.js';
import { SceneTree } from '../sceneTree.js';
import { SceneSync } from '../updateFlow.js';

/** Minimum spacing between scene-update requests. */
const UPDATE_GAP_MS = 30;

export type LiveOutputOptions = {
  outputId: string;
  element: ReactElement;
  request: RegisterOutput;
  api: ApiClient;
  sharedStreams: sm.LiveStreamDirectory<string>;
  /** Smelter.start() wall-clock instant, when already started. */
  anchorMs?: number;
  logger: Logger;
};

export class LiveOutput {
  public readonly outputId: string;
  public readonly runtime: sm.OutputRuntime;
  private readonly clock: sm.WallClock;
  private readonly scoped: sm.LiveStreamDirectory<number>;
  private readonly tree: SceneTree;
  private readonly sync: SceneSync;
  private readonly api: ApiClient;
  private readonly hasVideo: boolean;
  private readonly hasAudio: boolean;

  constructor(options: LiveOutputOptions) {
    const { outputId, api, logger } = options;
    this.outputId = outputId;
    this.api = api;
    this.hasVideo = 'video' in options.request && !!options.request.video;
    this.hasAudio = 'audio' in options.request && !!options.request.audio;

    this.clock = new sm.WallClock();
    if (options.anchorMs !== undefined) {
      this.clock.anchor(options.anchorMs);
    }
    this.scoped = new sm.LiveStreamDirectory<number>(logger);
    this.runtime = new sm.OutputRuntime({
      outputId,
      clock: this.clock,
      sharedStreams: options.sharedStreams,
      scopedStreams: this.scoped,
      services: this.services(),
      offline: false,
      log: logger,
    });

    this.sync = new SceneSync(UPDATE_GAP_MS, logger);
    this.runtime.mixer.version.watch(() => this.sync.mark());
    this.tree = new SceneTree(
      createElement(sm.OutputShell, { runtime: this.runtime }, options.element),
      {
        onCommit: () => this.sync.mark(),
        logger: logger.child({ element: 'scene-tree' }),
      }
    );
  }

  /** Current wire scene (update_scene request body). */
  public captureScene(): { video?: Api.VideoScene; audio?: Api.AudioScene } {
    return {
      video: this.hasVideo ? { root: this.tree.snapshot() } : undefined,
      audio: this.hasAudio ? { inputs: this.runtime.mixer.snapshot() } : undefined,
    };
  }

  /** Start pushing scene updates (after registerOutput succeeded). */
  public activate(): void {
    this.sync.attach(async () => {
      await this.api.updateScene(this.outputId, this.captureScene());
    });
  }

  public async shutdown(): Promise<void> {
    this.sync.detach();
    this.tree.unmount();
    await this.sync.settle();
  }

  public anchorClock(epochMs: number): void {
    this.clock.anchor(epochMs);
  }

  /** Directory server events for this output's scoped inputs land in. */
  public scopedStreams(): sm.LiveStreamDirectory<number> {
    return this.scoped;
  }

  /** Environment services for <Mp4/> and <Image source=.../>. */
  private services(): sm.OutputServices {
    return {
      addMp4Source: (handle, spec) =>
        this.scoped.locked(async dir => {
          const ref = {
            type: sm.OUTPUT_SPECIFIC_INPUT_TYPE,
            outputId: this.outputId,
            id: handle,
          } as const;
          const response = await this.api.registerInput(ref, {
            type: 'mp4',
            url: spec.url ?? undefined,
            path: spec.serverPath ?? undefined,
            loop: spec.loop ?? undefined,
            required: spec.required ?? undefined,
            offset_ms: spec.offsetMs ?? undefined,
            seek_ms: spec.seekMs ?? undefined,
            decoder_map: spec.decoderMap ?? undefined,
          } as Api.RegisterInput);
          dir.insert({
            inputId: handle,
            offsetMs: spec.offsetMs,
            videoDurationMs: response.video_duration_ms,
            audioDurationMs: response.audio_duration_ms,
            seekMs: spec.seekMs ?? 0,
          });
          return {
            videoDurationMs: response.video_duration_ms,
            audioDurationMs: response.audio_duration_ms,
          };
        }),
      removeMp4Source: async handle => {
        await this.api.unregisterInput(
          {
            type: sm.OUTPUT_SPECIFIC_INPUT_TYPE,
            outputId: this.outputId,
            id: handle,
          },
          {}
        );
        this.scoped.forget(handle);
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
