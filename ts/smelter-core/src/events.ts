/**
 * /ws server events: parsing into typed SDK events and routing stream
 * state into the live directories (global or per-output-scoped).
 */
import { _smelterInternals as sm } from '@smelter-tpu/smelter';
import type { Logger } from './logger.js';
import type { LiveOutput } from './output/live.js';

export const SmelterEventType = sm.SmelterEventType;

export type InputRef = sm.InputRef;

export type SmelterEvent =
  | {
      type:
        | typeof SmelterEventType.VIDEO_INPUT_DELIVERED
        | typeof SmelterEventType.AUDIO_INPUT_DELIVERED
        | typeof SmelterEventType.VIDEO_INPUT_PLAYING
        | typeof SmelterEventType.AUDIO_INPUT_PLAYING
        | typeof SmelterEventType.VIDEO_INPUT_PAUSED
        | typeof SmelterEventType.AUDIO_INPUT_PAUSED
        | typeof SmelterEventType.VIDEO_INPUT_EOS
        | typeof SmelterEventType.AUDIO_INPUT_EOS;
      inputRef: InputRef;
    }
  | { type: typeof SmelterEventType.OUTPUT_DONE; outputId: string }
  | {
      type: typeof SmelterEventType.OUTPUT_ERROR;
      outputId: string;
      severity: sm.SmelterErrorSeverity;
      err: string;
      stack: string;
    };

const INPUT_EVENT_TYPES: string[] = [
  SmelterEventType.VIDEO_INPUT_DELIVERED,
  SmelterEventType.AUDIO_INPUT_DELIVERED,
  SmelterEventType.VIDEO_INPUT_PLAYING,
  SmelterEventType.AUDIO_INPUT_PLAYING,
  SmelterEventType.VIDEO_INPUT_PAUSED,
  SmelterEventType.AUDIO_INPUT_PAUSED,
  SmelterEventType.VIDEO_INPUT_EOS,
  SmelterEventType.AUDIO_INPUT_EOS,
];

export function parseEvent(raw: unknown, logger: Logger): SmelterEvent | null {
  const event = raw as { type?: string; input_id?: string; output_id?: string };
  if (!event?.type) {
    logger.error(`Malformed event: ${JSON.stringify(raw)}`);
    return null;
  }
  if (INPUT_EVENT_TYPES.includes(event.type)) {
    return {
      type: event.type as SmelterEvent['type'],
      inputRef: sm.parseInputRef(event.input_id ?? ''),
    } as SmelterEvent;
  }
  if (event.type === SmelterEventType.OUTPUT_DONE) {
    return { type: SmelterEventType.OUTPUT_DONE, outputId: event.output_id ?? '' };
  }
  if (event.type === SmelterEventType.OUTPUT_ERROR) {
    const err = raw as { severity?: string; err?: string; stack?: string };
    return {
      type: SmelterEventType.OUTPUT_ERROR,
      outputId: event.output_id ?? '',
      severity: (err.severity ?? 'critical') as sm.SmelterErrorSeverity,
      err: err.err ?? '',
      stack: err.stack ?? '',
    };
  }
  logger.debug(`Unknown event type: ${event.type}`);
  return null;
}

const PHASE_BY_EVENT: Partial<
  Record<string, { track: 'videoState' | 'audioState'; phase: sm.StreamPhase }>
> = {
  [SmelterEventType.VIDEO_INPUT_DELIVERED]: { track: 'videoState', phase: 'ready' },
  [SmelterEventType.VIDEO_INPUT_PLAYING]: { track: 'videoState', phase: 'playing' },
  [SmelterEventType.VIDEO_INPUT_PAUSED]: { track: 'videoState', phase: 'paused' },
  [SmelterEventType.VIDEO_INPUT_EOS]: { track: 'videoState', phase: 'finished' },
  [SmelterEventType.AUDIO_INPUT_DELIVERED]: { track: 'audioState', phase: 'ready' },
  [SmelterEventType.AUDIO_INPUT_PLAYING]: { track: 'audioState', phase: 'playing' },
  [SmelterEventType.AUDIO_INPUT_PAUSED]: { track: 'audioState', phase: 'paused' },
  [SmelterEventType.AUDIO_INPUT_EOS]: { track: 'audioState', phase: 'finished' },
};

/** Apply an input event to the directory owning that stream. */
export function routeStreamEvent(
  shared: sm.LiveStreamDirectory<string>,
  outputs: Map<string, LiveOutput>,
  event: SmelterEvent
): void {
  if (event.type === SmelterEventType.OUTPUT_DONE) {
    return;
  }
  const effect = PHASE_BY_EVENT[event.type];
  if (!effect) {
    return;
  }
  const ref = event.inputRef;
  if (ref.type === 'global') {
    shared.patch({ inputId: ref.id, [effect.track]: effect.phase });
  } else {
    outputs
      .get(ref.outputId)
      ?.scopedStreams()
      .patch({ inputId: ref.id, [effect.track]: effect.phase });
  }
}
