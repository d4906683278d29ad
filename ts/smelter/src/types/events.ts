/**
 * Server WebSocket events (wire names must match pipeline/events.py /
 * the reference event stream).
 */
export enum SmelterEventType {
  AUDIO_INPUT_DELIVERED = 'AUDIO_INPUT_DELIVERED',
  VIDEO_INPUT_DELIVERED = 'VIDEO_INPUT_DELIVERED',
  AUDIO_INPUT_PLAYING = 'AUDIO_INPUT_PLAYING',
  VIDEO_INPUT_PLAYING = 'VIDEO_INPUT_PLAYING',
  AUDIO_INPUT_EOS = 'AUDIO_INPUT_EOS',
  VIDEO_INPUT_EOS = 'VIDEO_INPUT_EOS',
  OUTPUT_DONE = 'OUTPUT_DONE',
}

export type SmelterErrorSeverity = 'error' | 'warning';

export type SmelterEvent =
  | { type: SmelterEventType.AUDIO_INPUT_DELIVERED; inputId: string }
  | { type: SmelterEventType.VIDEO_INPUT_DELIVERED; inputId: string }
  | { type: SmelterEventType.AUDIO_INPUT_PLAYING; inputId: string }
  | { type: SmelterEventType.VIDEO_INPUT_PLAYING; inputId: string }
  | { type: SmelterEventType.AUDIO_INPUT_EOS; inputId: string }
  | { type: SmelterEventType.VIDEO_INPUT_EOS; inputId: string }
  | { type: SmelterEventType.OUTPUT_DONE; outputId: string };
