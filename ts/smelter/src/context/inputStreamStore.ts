/**
 * Stores of input-stream state (duration, play state, offsets) that hooks
 * subscribe to via useSyncExternalStore. The live store debounces rapid
 * per-input updates and can buffer events while a register call is in
 * flight (`runBlocking`); the offline store derives state purely from the
 * current render timestamp.
 */
import { useContext, useState } from 'react';
import { SmelterContext } from './index.js';
import type { Logger } from '../types/logger.js';
import {
  inputRefIntoRawId,
  OUTPUT_SPECIFIC_INPUT_TYPE,
} from '../types/refs/inputRef.js';

let nextStreamNumber = 1;

/** Allocates an output-scoped internal stream id (components like <Mp4 />). */
export function useInternalStreamId(): string {
  const ctx = useContext(SmelterContext);
  const [streamNumber] = useState(() => nextStreamNumber++);
  return inputRefIntoRawId({
    type: OUTPUT_SPECIFIC_INPUT_TYPE,
    id: streamNumber,
    outputId: ctx.outputId,
  });
}

export type StreamState = 'ready' | 'playing' | 'paused' | 'finished';

export type InputStreamInfo<Id> = {
  inputId: Id;
  videoState?: StreamState;
  audioState?: StreamState;
  offsetMs?: number | null;
  videoDurationMs?: number;
  audioDurationMs?: number;
  seekMs?: number;
};

type InstanceContext<Id = string> = Record<string, InputStreamInfo<Id>>;

export interface InputStreamStore<Id> {
  getSnapshot: () => InstanceContext<Id>;
  subscribe: (onStoreChange: () => void) => () => void;
}

type UpdateAction<Id> =
  | { type: 'update_input'; input: InputStreamInfo<Id> }
  | { type: 'add_input'; input: InputStreamInfo<Id> }
  | { type: 'remove_input'; inputId: Id };

const INPUT_UPDATE_DEBOUNCE_MS = 50;

export class LiveInputStreamStore<Id> implements InputStreamStore<Id> {
  private snapshot: InstanceContext<Id> = {};
  private listeners = new Set<() => void>();
  private queue?: UpdateAction<Id>[];
  private blocking?: Promise<unknown>;
  private debounced = new Map<
    Id,
    { input: InputStreamInfo<Id>; timeout: ReturnType<typeof setTimeout> }
  >();
  private logger: Logger;

  constructor(logger: Logger) {
    this.logger = logger;
  }

  public dispatchUpdate(action: UpdateAction<Id>): void {
    if (action.type === 'update_input') {
      this.debounce(action.input);
      return;
    }
    const id = action.type === 'remove_input' ? action.inputId : action.input.inputId;
    this.cancelDebounce(id);
    this.queueOrApply(action);
  }

  /**
   * Run `fn` with exclusive access to the store: updates dispatched by
   * events while `fn` is in flight are buffered and applied after it
   * settles, so register/unregister HTTP calls and server events cannot
   * interleave inconsistently.
   */
  public async runBlocking<T = void>(
    fn: (update: (action: UpdateAction<Id>) => void) => Promise<T>
  ): Promise<T> {
    while (this.blocking) {
      await this.blocking.catch(() => undefined);
    }
    this.queue = [];
    try {
      this.blocking = fn(action => this.apply(action));
      return (await this.blocking) as T;
    } finally {
      this.blocking = undefined;
      const queued = this.queue;
      this.queue = undefined;
      for (const action of queued) {
        this.apply(action);
      }
    }
  }

  private debounce(input: InputStreamInfo<Id>): void {
    const prior = this.debounced.get(input.inputId);
    if (prior) {
      clearTimeout(prior.timeout);
    }
    const merged = prior ? { ...prior.input, ...input } : input;
    const timeout = setTimeout(() => {
      this.debounced.delete(input.inputId);
      this.queueOrApply({ type: 'update_input', input: merged });
    }, INPUT_UPDATE_DEBOUNCE_MS);
    this.debounced.set(input.inputId, { input: merged, timeout });
  }

  private cancelDebounce(id: Id): void {
    const prior = this.debounced.get(id);
    if (prior) {
      clearTimeout(prior.timeout);
      this.debounced.delete(id);
    }
  }

  private queueOrApply(action: UpdateAction<Id>): void {
    if (this.queue) {
      this.queue.push(action);
    } else {
      this.apply(action);
    }
  }

  private apply(action: UpdateAction<Id>): void {
    const key = (id: Id) => String(id);
    if (action.type === 'add_input') {
      if (this.snapshot[key(action.input.inputId)]) {
        this.logger.warn(
          `Adding input ${String(action.input.inputId)}. Input already exists.`
        );
      }
      this.snapshot = { ...this.snapshot, [key(action.input.inputId)]: action.input };
    } else if (action.type === 'update_input') {
      const existing = this.snapshot[key(action.input.inputId)];
      if (!existing) {
        this.logger.warn(
          `Updating input ${String(action.input.inputId)}. Input does not exist.`
        );
        return;
      }
      this.snapshot = {
        ...this.snapshot,
        [key(action.input.inputId)]: { ...existing, ...action.input },
      };
    } else {
      this.cancelDebounce(action.inputId);
      const next = { ...this.snapshot };
      delete next[key(action.inputId)];
      this.snapshot = next;
    }
    for (const listener of this.listeners) {
      listener();
    }
  }

  public getSnapshot = (): InstanceContext<Id> => this.snapshot;

  public subscribe = (onStoreChange: () => void): (() => void) => {
    this.listeners.add(onStoreChange);
    return () => this.listeners.delete(onStoreChange);
  };
}

type OfflineAddInput<Id> = {
  inputId: Id;
  offsetMs: number;
  videoDurationMs?: number;
  audioDurationMs?: number;
  seekMs?: number;
};

/**
 * Offline store: input play state is a pure function of the render
 * timestamp (an input "plays" between its offset and offset+duration).
 */
export class OfflineInputStreamStore<Id> implements InputStreamStore<Id> {
  private snapshot: InstanceContext<Id> = {};
  private inputs: OfflineAddInput<Id>[] = [];
  private timestampMs = 0;
  private listeners = new Set<() => void>();

  public addInput(input: OfflineAddInput<Id>): void {
    this.inputs.push(input);
    this.setCurrentTimestamp(this.timestampMs);
  }

  public removeInput(inputId: Id): void {
    this.inputs = this.inputs.filter(input => input.inputId !== inputId);
    this.setCurrentTimestamp(this.timestampMs);
  }

  public setCurrentTimestamp(timestampMs: number): void {
    this.timestampMs = timestampMs;
    const snapshot: InstanceContext<Id> = {};
    for (const input of this.inputs) {
      const videoEnd = input.offsetMs + (input.videoDurationMs ?? Infinity);
      const audioEnd = input.offsetMs + (input.audioDurationMs ?? Infinity);
      const started = timestampMs >= input.offsetMs;
      snapshot[String(input.inputId)] = {
        inputId: input.inputId,
        videoState: started ? (timestampMs < videoEnd ? 'playing' : 'finished') : 'ready',
        audioState: started ? (timestampMs < audioEnd ? 'playing' : 'finished') : 'ready',
        offsetMs: input.offsetMs,
        videoDurationMs: input.videoDurationMs,
        audioDurationMs: input.audioDurationMs,
        seekMs: input.seekMs,
      };
    }
    this.snapshot = snapshot;
    for (const listener of this.listeners) {
      listener();
    }
  }

  public getSnapshot = (): InstanceContext<Id> => this.snapshot;

  public subscribe = (onStoreChange: () => void): (() => void) => {
    this.listeners.add(onStoreChange);
    return () => this.listeners.delete(onStoreChange);
  };
}
