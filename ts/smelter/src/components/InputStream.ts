/** InputStream: renders a globally registered input (wire: InputStream). */
import { createElement, useContext, useEffect, useState } from 'react';
import type * as Api from '../api.js';
import type { ComponentBaseProps, SceneComponent } from '../component.js';
import { createSmelterComponent } from '../component.js';
import { useTimeLimitedComponent } from '../context/childrenLifetimeContext.js';
import { SmelterContext } from '../context/index.js';
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
  _children: SceneComponent[]
): Api.Component {
  return {
    type: 'input_stream',
    id: props.id,
    input_id: props.inputId,
  };
}

export const InnerInputStream =
  createSmelterComponent<Omit<InputStreamProps, AudioPropNames>>(sceneBuilder);

function useTimeLimitedInputStream(inputId: string): void {
  const ctx = useContext(SmelterContext);
  const [mountTs, setMountTs] = useState(0);
  useEffect(() => {
    setMountTs(ctx.timeContext.timestampMs());
  }, [inputId]);

  const inputs = useInputStreams();
  const input = inputs[inputId];
  const videoDurationMs = Math.max(0, (input?.videoDurationMs ?? 0) - (input?.seekMs ?? 0));
  const audioDurationMs = Math.max(0, (input?.audioDurationMs ?? 0) - (input?.seekMs ?? 0));
  useTimeLimitedComponent((input?.offsetMs ?? mountTs) + videoDurationMs);
  useTimeLimitedComponent((input?.offsetMs ?? mountTs) + audioDurationMs);
}

function InputStream(props: InputStreamProps) {
  const { muted, volume, inputId, ...rest } = props;
  useAudioInput(inputId, { volume: muted ? 0 : (volume ?? 1) });
  useTimeLimitedInputStream(inputId);
  return createElement(InnerInputStream, {
    ...rest,
    inputId: inputRefIntoRawId({ type: 'global', id: inputId }),
  });
}

export default InputStream;
