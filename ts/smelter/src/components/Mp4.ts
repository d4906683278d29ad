/**
 * Mp4 component: registers an output-scoped MP4 input from `source` and
 * renders it like an InputStream, including audio contribution and
 * offline lifetime limiting by the file's duration.
 */
import {
  createElement,
  useContext,
  useEffect,
  useState,
  useSyncExternalStore,
} from 'react';
import type { ComponentBaseProps } from '../component.js';
import { useTimeLimitedComponent } from '../context/childrenLifetimeContext.js';
import { SmelterContext } from '../context/index.js';
import { newInternalStreamId } from '../context/internalStreamIdManager.js';
import { newBlockingTask } from '../hooks.js';
import { OfflineTimeContext } from '../context/timeContext.js';
import type { RegisterMp4Input } from '../types/input/common.js';
import {
  inputRefIntoRawId,
  OUTPUT_SPECIFIC_INPUT_TYPE,
} from '../types/refs/inputRef.js';
import { InnerInputStream } from './InputStream.js';

export type Mp4Props = Omit<ComponentBaseProps, 'children'> & {
  /** Audio volume [0, 1]. */
  volume?: number;
  muted?: boolean;
  seekMs?: number;
  loop?: boolean;
  /** URL, server path, or (browser only) Blob. */
  source: string | Blob;
};

function useInternalAudioInput(inputId: number, volume: number): void {
  const ctx = useContext(SmelterContext);
  useEffect(() => {
    if (inputId === 0) {
      return;
    }
    const options = { volume };
    const ref = {
      type: OUTPUT_SPECIFIC_INPUT_TYPE,
      id: inputId,
      outputId: ctx.outputId,
    } as const;
    ctx.audioContext.addInputAudioComponent(ref, options);
    return () => ctx.audioContext.removeInputAudioComponent(ref, options);
  }, [inputId, volume]);
}

function useTimeLimitedMp4(inputId: number): void {
  const ctx = useContext(SmelterContext);
  const [mountTs, setMountTs] = useState(0);
  useEffect(() => {
    setMountTs(ctx.timeContext.timestampMs());
  }, [inputId]);

  const streams = useSyncExternalStore(
    ctx.internalInputStreamStore.subscribe,
    ctx.internalInputStreamStore.getSnapshot
  );
  const input = streams[String(inputId)];
  const videoDurationMs = Math.max(0, (input?.videoDurationMs ?? 0) - (input?.seekMs ?? 0));
  const audioDurationMs = Math.max(0, (input?.audioDurationMs ?? 0) - (input?.seekMs ?? 0));
  useTimeLimitedComponent((input?.offsetMs ?? mountTs) + videoDurationMs);
  useTimeLimitedComponent((input?.offsetMs ?? mountTs) + audioDurationMs);
}

function Mp4(props: Mp4Props) {
  const { muted, volume, source, ...rest } = props;
  const ctx = useContext(SmelterContext);
  const [inputId, setInputId] = useState(0);

  useEffect(() => {
    const newInputId = newInternalStreamId();
    setInputId(newInputId);

    let sourceField: Pick<RegisterMp4Input, 'url' | 'serverPath' | 'blob'>;
    if (typeof source !== 'string') {
      if (typeof window === 'undefined') {
        throw new Error('Blob as a source is not supported on Node.js');
      }
      sourceField = { blob: source };
    } else if (source.startsWith('http://') || source.startsWith('https://')) {
      sourceField = { url: source };
    } else {
      sourceField = { serverPath: source };
    }

    let registerPromise: Promise<unknown> | undefined;
    const task = newBlockingTask(ctx);
    void (async () => {
      try {
        registerPromise = ctx.registerMp4Input(newInputId, {
          ...sourceField,
          loop: props.loop,
          seekMs: props.seekMs,
          // offline outputs must block on the file being ready
          required: ctx.timeContext instanceof OfflineTimeContext,
        });
        await registerPromise;
      } finally {
        task.done();
      }
    })();
    return () => {
      task.done();
      void (async () => {
        await registerPromise?.catch(() => undefined);
        await ctx.unregisterMp4Input(newInputId);
      })();
    };
  }, [props.source, props.seekMs, props.loop]);

  useInternalAudioInput(inputId, muted ? 0 : (volume ?? 1));
  useTimeLimitedMp4(inputId);

  return createElement(InnerInputStream, {
    ...rest,
    inputId: inputRefIntoRawId({
      type: OUTPUT_SPECIFIC_INPUT_TYPE,
      id: inputId,
      outputId: ctx.outputId,
    }),
  });
}

export default Mp4;
