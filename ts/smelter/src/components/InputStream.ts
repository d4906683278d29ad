/** InputStream: renders a globally registered input (wire: InputStream). */
import { createElement } from 'react';
import type * as Api from '../api.js';
import type { ComponentBaseProps, SceneFragment } from '../scene.js';
import { sceneNode } from '../scene.js';
import { useMountTimestamp, useRetainUntil } from '../lifecycle.js';
import { useAudioInput, useInputStreams } from '../hooks.js';
import { inputRefIntoRawId } from '../types/refs/inputRef.js';

export type InputStreamProps = Omit<ComponentBaseProps, 'children'> & {
  /** Id the input was registered with. */
  inputId: Api.InputId;
  /** Audio volume [0, 1] contributed to this output. */
  volume?: number;
  /** Mute audio. */
  muted?: boolean;
};

type AudioPropNames = 'muted' | 'volume';

function sceneBuilder(
  props: Omit<InputStreamProps, AudioPropNames>,
  _children: SceneFragment[]
): Api.Component {
  return {
    type: 'input_stream',
    id: props.id,
    input_id: props.inputId,
  };
}

/** The bare scene node; <Mp4/> reuses it with an output-scoped raw id. */
export const RawInputStream =
  sceneNode<Omit<InputStreamProps, AudioPropNames>>('input_stream', sceneBuilder);

/** Hold the surrounding keep-alive scope open while the stream has media. */
export function useStreamLifetime(entry: {
  offsetMs?: number | null;
  videoDurationMs?: number;
  audioDurationMs?: number;
  seekMs?: number;
} | undefined): void {
  const mountMs = useMountTimestamp();
  const startMs = entry?.offsetMs ?? mountMs;
  const played = (durationMs: number | undefined) =>
    Math.max(0, (durationMs ?? 0) - (entry?.seekMs ?? 0));
  useRetainUntil(startMs + played(entry?.videoDurationMs));
  useRetainUntil(startMs + played(entry?.audioDurationMs));
}

function InputStream(props: InputStreamProps) {
  const { muted, volume, inputId, ...rest } = props;
  useAudioInput(inputId, { volume: muted ? 0 : (volume ?? 1) });
  useStreamLifetime(useInputStreams()[inputId]);
  return createElement(RawInputStream, {
    ...rest,
    inputId: inputRefIntoRawId({ type: 'global', id: inputId }),
  });
}

export default InputStream;
