/**
 * Public hooks. Behavior matches the reference SDK's hook surface
 * (reference ts/smelter/src/hooks.ts); the implementation rides this SDK's
 * Cell/runtime model instead. Ordered alphabetically.
 */
import { useEffect, useState } from 'react';

import type * as Api from './api.js';
import { useCell } from './reactive.js';
import type { StreamEntry } from './runtime.js';
import { useRuntime } from './runtime.js';
import { inputRefIntoRawId } from './types/refs/inputRef.js';

export type AudioOptions = {
  volume: number;
};

/** True once the render timestamp passes `timestamp` (ms). */
export function useAfterTimestamp(timestamp: number): boolean {
  const runtime = useRuntime();
  const now = useCurrentTimestamp();
  useEffect(() => {
    return timestamp === Infinity ? undefined : runtime.clock.markInterest(timestamp);
  }, [timestamp]);
  return now >= timestamp;
}

/**
 * Control an input's audio contribution to this output. When rendering an
 * <InputStream/> component prefer its `muted`/`volume` props.
 */
export function useAudioInput(inputId: Api.InputId, audioOptions: AudioOptions): void {
  const runtime = useRuntime();
  const volume = audioOptions.volume;
  useEffect(() => {
    const rawId = inputRefIntoRawId({ type: 'global', id: inputId });
    return runtime.mixer.contribute(rawId, volume);
  }, [inputId, volume]);
}

/**
 * Run an async function; in offline mode rendering for the current
 * timestamp blocks until it settles.
 */
export function useBlockingTask<T>(fn: () => Promise<T>): T | undefined {
  const runtime = useRuntime();
  const [result, setResult] = useState<T | undefined>(undefined);
  useEffect(() => {
    const release = runtime.clock.hold();
    fn().then(
      value => {
        setResult(value);
        release();
      },
      () => release()
    );
    return release;
  }, []);
  return result;
}

/**
 * Current timestamp relative to Smelter.start(). Re-renders only fire for
 * timestamps registered via useAfterTimestamp.
 */
export function useCurrentTimestamp(): number {
  const runtime = useRuntime();
  useCell(runtime.clock.tick);
  return runtime.clock.now();
}

/** Snapshot of every globally registered input stream. */
export function useInputStreams(): Record<Api.InputId, StreamEntry<string>> {
  return useCell(useRuntime().sharedStreams.cell);
}
