/**
 * Server WebSocket events (wire names must match pipeline/events.py /
 * the reference event stream).
 */
export enum SmelterEventType {
  AUDIO_INPUT_DELIVERED = 'AUDIO_INPUT_DELIVERED',
  VIDEO_INPUT_DELIVERED = 'VIDEO_INPUT_DELIVERED',
  AUDIO_INPUT_PLAYING = 'AUDIO_INPUT_PLAYING',
  VIDEO_INPUT_PLAYING = 'VIDEO_INPUT_PLAYING',
  AUDIO_INPUT_PAUSED = 'AUDIO_INPUT_PAUSED',
  VIDEO_INPUT_PAUSED = 'VIDEO_INPUT_PAUSED',
  AUDIO_INPUT_EOS = 'AUDIO_INPUT_EOS',
  VIDEO_INPUT_EOS = 'VIDEO_INPUT_EOS',
  OUTPUT_DONE = 'OUTPUT_DONE',
  OUTPUT_ERROR = 'OUTPUT_ERROR',
}

export type SmelterErrorSeverity = 'critical' | 'transient' | 'warning';

export type SmelterEvent =
  | { type: SmelterEventType.AUDIO_INPUT_DELIVERED; inputId: string }
  | { type: SmelterEventType.VIDEO_INPUT_DELIVERED; inputId: string }
  | { type: SmelterEventType.AUDIO_INPUT_PLAYING; inputId: string }
  | { type: SmelterEventType.VIDEO_INPUT_PLAYING; inputId: string }
  | { type: SmelterEventType.AUDIO_INPUT_PAUSED; inputId: string }
  | { type: SmelterEventType.VIDEO_INPUT_PAUSED; inputId: string }
  | { type: SmelterEventType.AUDIO_INPUT_EOS; inputId: string }
  | { type: SmelterEventType.VIDEO_INPUT_EOS; inputId: string }
  | { type: SmelterEventType.OUTPUT_DONE; outputId: string }
  | {
      type: SmelterEventType.OUTPUT_ERROR;
      outputId: string;
      severity: SmelterErrorSeverity;
      err: string;
      stack: string;
    };
