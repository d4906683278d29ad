/** Route parsed server events into the global or per-output stores. */
import { _smelterInternals } from '@smelter-tpu/smelter';
import type { SmelterEvent } from '../event.js';
import { SmelterEventType } from '../event.js';
import type Output from './output.js';

type LiveInputStreamStore<Id> = _smelterInternals.LiveInputStreamStore<Id>;
type StreamState = _smelterInternals.StreamState;

const VIDEO_STATE: Partial<Record<string, StreamState>> = {
  [SmelterEventType.VIDEO_INPUT_DELIVERED]: 'ready',
  [SmelterEventType.VIDEO_INPUT_PLAYING]: 'playing',
  [SmelterEventType.VIDEO_INPUT_EOS]: 'finished',
};

const AUDIO_STATE: Partial<Record<string, StreamState>> = {
  [SmelterEventType.AUDIO_INPUT_DELIVERED]: 'ready',
  [SmelterEventType.AUDIO_INPUT_PLAYING]: 'playing',
  [SmelterEventType.AUDIO_INPUT_EOS]: 'finished',
};

export function handleEvent(
  store: LiveInputStreamStore<string>,
  outputs: Record<string, Output>,
  event: SmelterEvent
): void {
  if (event.type === SmelterEventType.OUTPUT_DONE) {
    return;
  }
  const videoState = VIDEO_STATE[event.type];
  const audioState = AUDIO_STATE[event.type];
  if (!videoState && !audioState) {
    return;
  }
  const patch = videoState ? { videoState } : { audioState: audioState! };
  const ref = event.inputRef;
  if (ref.type === 'global') {
    store.dispatchUpdate({
      type: 'update_input',
      input: { inputId: ref.id, ...patch },
    });
  } else {
    outputs[ref.outputId]?.inputStreamStore().dispatchUpdate({
      type: 'update_input',
      input: { inputId: ref.id, ...patch },
    });
  }
}
