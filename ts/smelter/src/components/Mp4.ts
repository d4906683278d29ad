/**
 * Mp4 component: registers an output-scoped MP4 input from `source` and
 * renders it like an InputStream, including audio contribution and
 * offline lifetime limiting by the file's duration.
 */
import { createElement, useEffect, useState } from 'react';
import type { ComponentBaseProps } from '../scene.js';
import { useCell } from '../reactive.js';
import { useRuntime } from '../runtime.js';
import type { RegisterMp4Input } from '../types/input/common.js';
import {
  inputRefIntoRawId,
  OUTPUT_SPECIFIC_INPUT_TYPE,
} from '../types/refs/inputRef.js';
import { RawInputStream, useStreamLifetime } from './InputStream.js';

export type Mp4Props = Omit<ComponentBaseProps, 'children'> & {
  /** Audio volume [0, 1]. */
  volume?: number;
  muted?: boolean;
  seekMs?: number;
  loop?: boolean;
  /** URL, server path, or (browser only) Blob. */
  source: string | Blob;
};

function classifySource(
  source: string | Blob
): Pick<RegisterMp4Input, 'url' | 'serverPath' | 'blob'> {
  if (typeof source !== 'string') {
    if (typeof window === 'undefined') {
      throw new Error('Blob as a source is not supported on Node.js');
    }
    return { blob: source };
  }
  if (source.startsWith('http://') || source.startsWith('https://')) {
    return { url: source };
  }
  return { serverPath: source };
}

function Mp4(props: Mp4Props) {
  const { muted, volume, source, ...rest } = props;
  const runtime = useRuntime();
  const [handle, setHandle] = useState(0);

  useEffect(() => {
    const newHandle = runtime.allocHandle();
    setHandle(newHandle);

    // offline rendering blocks on the file being ready
    const release = runtime.clock.hold();
    const registration = (async () => {
      try {
        await runtime.addMp4Source(newHandle, {
          ...classifySource(source),
          loop: props.loop,
          seekMs: props.seekMs,
          required: runtime.offline,
        });
      } finally {
        release();
      }
    })();
    return () => {
      release();
      void registration
        .catch(() => undefined)
        .then(() => runtime.removeMp4Source(newHandle));
    };
  }, [props.source, props.seekMs, props.loop]);

  // audio contribution under the output-scoped raw id
  const rawId = inputRefIntoRawId({
    type: OUTPUT_SPECIFIC_INPUT_TYPE,
    id: handle,
    outputId: runtime.outputId,
  });
  const effectiveVolume = muted ? 0 : (volume ?? 1);
  useEffect(() => {
    if (handle === 0) {
      return;
    }
    return runtime.mixer.contribute(rawId, effectiveVolume);
  }, [rawId, effectiveVolume, handle]);

  useStreamLifetime(useCell(runtime.scopedStreams.cell)[String(handle)]);

  return createElement(RawInputStream, { ...rest, inputId: rawId });
}

export default Mp4;
