/** Parse raw /ws events into typed SDK events keyed by input/output refs. */
import { _smelterInternals } from '@smelter-tpu/smelter';
import type { Logger } from './logger.js';

export const SmelterEventType = _smelterInternals.SmelterEventType;

export type InputRef = _smelterInternals.InputRef;

export type SmelterEvent =
  | {
      type:
        | typeof SmelterEventType.VIDEO_INPUT_DELIVERED
        | typeof SmelterEventType.AUDIO_INPUT_DELIVERED
        | typeof SmelterEventType.VIDEO_INPUT_PLAYING
        | typeof SmelterEventType.AUDIO_INPUT_PLAYING
        | typeof SmelterEventType.VIDEO_INPUT_EOS
        | typeof SmelterEventType.AUDIO_INPUT_EOS;
      inputRef: InputRef;
    }
  | { type: typeof SmelterEventType.OUTPUT_DONE; outputId: string };

const INPUT_EVENT_TYPES: string[] = [
  SmelterEventType.VIDEO_INPUT_DELIVERED,
  SmelterEventType.AUDIO_INPUT_DELIVERED,
  SmelterEventType.VIDEO_INPUT_PLAYING,
  SmelterEventType.AUDIO_INPUT_PLAYING,
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
      inputRef: _smelterInternals.parseInputRef(event.input_id ?? ''),
    } as SmelterEvent;
  }
  if (event.type === SmelterEventType.OUTPUT_DONE) {
    return { type: SmelterEventType.OUTPUT_DONE, outputId: event.output_id ?? '' };
  }
  logger.debug(`Unknown event type: ${event.type}`);
  return null;
}
