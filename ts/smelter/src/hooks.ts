/** Public hooks (reference ts/smelter/src/hooks.ts surface). */
import { useContext, useEffect, useState, useSyncExternalStore } from 'react';

import type * as Api from './api.js';
import type { SmelterOutputContext } from './context/index.js';
import { SmelterContext } from './context/index.js';
import type { BlockingTask } from './context/timeContext.js';
import { OfflineTimeContext } from './context/timeContext.js';
import type { InputStreamInfo } from './context/inputStreamStore.js';

/** Snapshot of every globally registered input stream. */
export function useInputStreams(): Record<Api.InputId, InputStreamInfo<string>> {
  const ctx = useContext(SmelterContext);
  return useSyncExternalStore(
    ctx.globalInputStreamStore.subscribe,
    ctx.globalInputStreamStore.getSnapshot
  );
}

export type AudioOptions = {
  volume: number;
};

/**
 * Control an input's audio contribution to this output. When rendering an
 * <InputStream/> component prefer its `muted`/`volume` props.
 */
export function useAudioInput(inputId: Api.InputId, audioOptions: AudioOptions): void {
  const ctx = useContext(SmelterContext);
  useEffect(() => {
    const options = { ...audioOptions };
    ctx.audioContext.addInputAudioComponent({ type: 'global', id: inputId }, options);
    return () => {
      ctx.audioContext.removeInputAudioComponent({ type: 'global', id: inputId }, options);
    };
  }, [audioOptions]);
}

/**
 * Current timestamp relative to Smelter.start(). Re-renders only fire for
 * timestamps registered via useAfterTimestamp.
 */
export function useCurrentTimestamp(): number {
  const ctx = useContext(SmelterContext);
  useSyncExternalStore(ctx.timeContext.subscribe, ctx.timeContext.getSnapshot);
  return ctx.timeContext.timestampMs();
}

/** True once the render timestamp passes `timestamp` (ms). */
export function useAfterTimestamp(timestamp: number): boolean {
  const ctx = useContext(SmelterContext);
  const current = useCurrentTimestamp();
  useEffect(() => {
    if (timestamp === Infinity) {
      return;
    }
    const entry = { timestamp };
    ctx.timeContext.addTimestamp(entry);
    return () => ctx.timeContext.removeTimestamp(entry);
  }, [timestamp]);
  return current >= timestamp;
}

/**
 * Create a task that blocks offline rendering until done() is called
 * (no-op in live mode).
 */
export function newBlockingTask(ctx: SmelterOutputContext): BlockingTask {
  if (ctx.timeContext instanceof OfflineTimeContext) {
    return ctx.timeContext.newBlockingTask();
  }
  return { done: () => undefined };
}

/**
 * Run an async function; in offline mode rendering for the current
 * timestamp blocks until it settles.
 */
export function useBlockingTask<T>(fn: () => Promise<T>): T | undefined {
  const ctx = useContext(SmelterContext);
  const [result, setResult] = useState<T | undefined>(undefined);
  useEffect(() => {
    const task = newBlockingTask(ctx);
    void (async () => {
      try {
        setResult(await fn());
      } finally {
        task.done();
      }
    })();
    return () => task.done();
  }, []);
  return result;
}
