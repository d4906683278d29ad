/**
 * Per-output runtime: the single object every Smelter component reads
 * through React context. It bundles
 *
 *   - a clock (`WallClock` for live outputs, `SteppedClock` for offline
 *     rendering, where time advances mark-to-mark and async registrations
 *     hold the step),
 *   - stream directories (reactive registries of input-stream state —
 *     event-driven for live, derived-from-timestamp for offline),
 *   - the audio mix (per-input volume contributions, sum-clamped),
 *   - a keep-alive counter (how offline outputs and <SlideShow/> know all
 *     time-limited content has finished), and
 *   - the services environment packages provide for components that
 *     create output-scoped resources (<Mp4/>, <Image source=.../>).
 *
 * Everything observable is a `Cell`, so hooks are one-liners and there is
 * exactly one subscription mechanism in the SDK.
 */
import { createContext, useContext } from 'react';
import { Cell } from './reactive.js';
import type { RegisterMp4Input } from './types/input/common.js';
import type { RegisterImage } from './types/resource.js';
import type { Logger } from './types/logger.js';
import { noopLogger } from './types/logger.js';

// ---------------------------------------------------------------------------
// clocks
// ---------------------------------------------------------------------------

export interface SmelterClock {
  /** Notifies watchers whenever a point of interest is reached. */
  readonly tick: Cell<number>;
  /** Milliseconds since the output's timeline origin. */
  now(): number;
  /** Ask to be woken (a tick) once the clock passes `atMs`; returns cancel. */
  markInterest(atMs: number): () => void;
  /** Gate clock advancement (offline); live clocks return a no-op release. */
  hold(): () => void;
}

/** Live clock: wall time anchored to Smelter.start(). */
export class WallClock implements SmelterClock {
  public readonly tick = new Cell(0);
  private epochMs = 0;

  public anchor(epochMs: number): void {
    this.epochMs = epochMs;
  }

  public now(): number {
    return this.epochMs ? Date.now() - this.epochMs : 0;
  }

  public markInterest(atMs: number): () => void {
    const waitMs = atMs - this.now();
    if (waitMs < 0 || !isFinite(waitMs)) {
      return () => undefined;
    }
    // +300 ms so the wake lands safely past the timestamp
    const timer = setTimeout(() => this.tick.write(this.now()), waitMs + 300);
    return () => clearTimeout(timer);
  }

  public hold(): () => void {
    return () => undefined;
  }
}

/**
 * Offline clock: time only moves when the output driver calls `advance()`,
 * jumping to the nearest registered point of interest. `hold()` lets async
 * work (input registration) pin the current step until it settles.
 */
export class SteppedClock implements SmelterClock {
  public readonly tick = new Cell(0);
  private interests = new Set<{ at: number }>();
  private holds = 0;
  /** Fires when the last hold is released (the output driver waits on it). */
  public onReleased?: () => void;

  public now(): number {
    return this.tick.read();
  }

  public markInterest(atMs: number): () => void {
    const mark = { at: atMs };
    this.interests.add(mark);
    return () => {
      this.interests.delete(mark);
    };
  }

  public hold(): () => void {
    this.holds += 1;
    let released = false;
    return () => {
      if (released) {
        return;
      }
      released = true;
      this.holds -= 1;
      if (this.holds === 0) {
        this.onReleased?.();
      }
    };
  }

  public isHeld(): boolean {
    return this.holds > 0;
  }

  /** Jump to the next point of interest. False when none remain. */
  public advance(): boolean {
    const current = this.now();
    let next = Infinity;
    for (const mark of this.interests) {
      if (mark.at > current && mark.at < next) {
        next = mark.at;
      }
    }
    if (!isFinite(next)) {
      return false;
    }
    this.tick.write(next);
    return true;
  }
}

// ---------------------------------------------------------------------------
// stream directories
// ---------------------------------------------------------------------------

export type StreamPhase = 'ready' | 'playing' | 'paused' | 'finished';

export type StreamEntry<K = string> = {
  inputId: K;
  videoState?: StreamPhase;
  audioState?: StreamPhase;
  offsetMs?: number | null;
  videoDurationMs?: number;
  audioDurationMs?: number;
  seekMs?: number;
};

export type StreamMap<K = string> = Record<string, StreamEntry<K>>;

export interface StreamDirectory<K = string> {
  readonly cell: Cell<StreamMap<K>>;
}

/** How long rapid per-input event patches coalesce before publishing. */
const PATCH_COALESCE_MS = 50;

type DirectWriter<K> = {
  insert(entry: StreamEntry<K>): void;
  forget(inputId: K): void;
};

/**
 * Live directory: state arrives as server events (`patch`, coalesced) and
 * register/unregister results (`insert`/`forget`). `locked()` runs an async
 * critical section (an HTTP registration) during which event patches are
 * parked, so request/response and event updates can never interleave into
 * an inconsistent snapshot.
 */
export class LiveStreamDirectory<K = string> implements StreamDirectory<K> {
  public readonly cell = new Cell<StreamMap<K>>({});
  private log: Logger;
  private parked: Array<() => void> | null = null;
  private turn: Promise<unknown> = Promise.resolve();
  private coalescing = new Map<
    string,
    { merged: StreamEntry<K>; timer: ReturnType<typeof setTimeout> }
  >();

  constructor(log: Logger = noopLogger) {
    this.log = log;
  }

  public insert(entry: StreamEntry<K>): void {
    this.dropCoalesced(entry.inputId);
    this.enact(() => this.commitInsert(entry));
  }

  public forget(inputId: K): void {
    this.dropCoalesced(inputId);
    this.enact(() => this.commitForget(inputId));
  }

  /** Coalesced partial update (server events). */
  public patch(entry: StreamEntry<K>): void {
    const key = String(entry.inputId);
    const prior = this.coalescing.get(key);
    if (prior) {
      clearTimeout(prior.timer);
    }
    const merged = prior ? { ...prior.merged, ...entry } : entry;
    const timer = setTimeout(() => {
      this.coalescing.delete(key);
      this.enact(() => this.commitPatch(merged));
    }, PATCH_COALESCE_MS);
    this.coalescing.set(key, { merged, timer });
  }

  /**
   * Async critical section. `fn` gets a writer whose mutations land
   * immediately; everything else is parked until `fn` settles. Sections
   * queue behind each other.
   */
  public locked<T>(fn: (dir: DirectWriter<K>) => Promise<T>): Promise<T> {
    const writer: DirectWriter<K> = {
      insert: entry => this.commitInsert(entry),
      forget: inputId => this.commitForget(inputId),
    };
    const section = async (): Promise<T> => {
      this.parked = [];
      try {
        return await fn(writer);
      } finally {
        const parked = this.parked;
        this.parked = null;
        for (const action of parked) {
          action();
        }
      }
    };
    const result = this.turn.then(section, section);
    this.turn = result.catch(() => undefined);
    return result;
  }

  private enact(action: () => void): void {
    if (this.parked) {
      this.parked.push(action);
    } else {
      action();
    }
  }

  private dropCoalesced(inputId: K): void {
    const prior = this.coalescing.get(String(inputId));
    if (prior) {
      clearTimeout(prior.timer);
      this.coalescing.delete(String(inputId));
    }
  }

  private commitInsert(entry: StreamEntry<K>): void {
    const key = String(entry.inputId);
    if (this.cell.read()[key]) {
      this.log.warn(`stream ${key} inserted twice`);
    }
    this.cell.swap(map => ({ ...map, [key]: entry }));
  }

  private commitPatch(entry: StreamEntry<K>): void {
    const key = String(entry.inputId);
    const existing = this.cell.read()[key];
    if (!existing) {
      this.log.warn(`patch for unknown stream ${key}`);
      return;
    }
    this.cell.swap(map => ({ ...map, [key]: { ...existing, ...entry } }));
  }

  private commitForget(inputId: K): void {
    const key = String(inputId);
    this.cell.swap(map => {
      const next = { ...map };
      delete next[key];
      return next;
    });
  }
}

export type TimelineSpan<K = string> = {
  inputId: K;
  offsetMs: number;
  videoDurationMs?: number;
  audioDurationMs?: number;
  seekMs?: number;
};

/**
 * Offline directory: stream phase is a pure function of the render
 * timestamp (an input plays between its offset and offset+duration).
 * Bind it to a SteppedClock and it recomputes on every step.
 */
export class TimelineStreamDirectory<K = string> implements StreamDirectory<K> {
  public readonly cell = new Cell<StreamMap<K>>({});
  private spans: TimelineSpan<K>[] = [];
  private atMs = 0;

  public bindClock(clock: SmelterClock): void {
    clock.tick.watch(() => this.seek(clock.now()));
  }

  public track(span: TimelineSpan<K>): void {
    this.spans.push(span);
    this.rebuild();
  }

  public forget(inputId: K): void {
    this.spans = this.spans.filter(span => span.inputId !== inputId);
    this.rebuild();
  }

  public seek(timestampMs: number): void {
    this.atMs = timestampMs;
    this.rebuild();
  }

  private rebuild(): void {
    const snapshot: StreamMap<K> = {};
    for (const span of this.spans) {
      const phase = (durationMs: number | undefined): StreamPhase => {
        if (this.atMs < span.offsetMs) {
          return 'ready';
        }
        return this.atMs < span.offsetMs + (durationMs ?? Infinity)
          ? 'playing'
          : 'finished';
      };
      snapshot[String(span.inputId)] = {
        inputId: span.inputId,
        videoState: phase(span.videoDurationMs),
        audioState: phase(span.audioDurationMs),
        offsetMs: span.offsetMs,
        videoDurationMs: span.videoDurationMs,
        audioDurationMs: span.audioDurationMs,
        seekMs: span.seekMs,
      };
    }
    this.cell.write(snapshot);
  }
}

// ---------------------------------------------------------------------------
// audio mix
// ---------------------------------------------------------------------------

/**
 * Per-output audio mix. Mounted components contribute volumes for raw
 * input ids; contributions for the same input sum, clamped to 1.0.
 */
export class AudioMix {
  /** Bumped on every change so output drivers can push scene updates. */
  public readonly version = new Cell(0);
  private contributions = new Map<string, number[]>();

  /** Add a contribution; returns its release. */
  public contribute(rawInputId: string, volume: number): () => void {
    const volumes = this.contributions.get(rawInputId) ?? [];
    volumes.push(volume);
    this.contributions.set(rawInputId, volumes);
    this.version.swap(v => v + 1);
    let released = false;
    return () => {
      if (released) {
        return;
      }
      released = true;
      const current = this.contributions.get(rawInputId);
      if (!current) {
        return;
      }
      const at = current.indexOf(volume);
      if (at >= 0) {
        current.splice(at, 1);
      }
      if (current.length === 0) {
        this.contributions.delete(rawInputId);
      }
      this.version.swap(v => v + 1);
    };
  }

  /** Wire-shaped mix: one entry per contributing input. */
  public snapshot(): Array<{ input_id: string; volume: number }> {
    const mix: Array<{ input_id: string; volume: number }> = [];
    for (const [input_id, volumes] of this.contributions) {
      const total = volumes.reduce((sum, volume) => sum + volume, 0);
      mix.push({ input_id, volume: Math.min(total, 1.0) });
    }
    return mix;
  }
}

// ---------------------------------------------------------------------------
// keep-alive
// ---------------------------------------------------------------------------

/**
 * Counts outstanding time-limited content. Offline outputs send EOS when
 * the count drops to zero; <SlideShow/> uses a scoped instance to know the
 * current slide finished.
 */
export class KeepAlive {
  public readonly pending = new Cell(0);

  /** Retain; returns an idempotent release. */
  public retain(): () => void {
    this.pending.swap(n => n + 1);
    let released = false;
    return () => {
      if (released) {
        return;
      }
      released = true;
      this.pending.swap(n => n - 1);
    };
  }

  public idle(): boolean {
    return this.pending.read() === 0;
  }
}

// ---------------------------------------------------------------------------
// runtime
// ---------------------------------------------------------------------------

export type Mp4SourceSpec = RegisterMp4Input;
export type ImageAssetSpec = RegisterImage;

/** Environment services for components that mint output-scoped resources. */
export interface OutputServices {
  addMp4Source(
    handle: number,
    spec: Mp4SourceSpec
  ): Promise<{ videoDurationMs?: number; audioDurationMs?: number }>;
  removeMp4Source(handle: number): Promise<void>;
  addImageAsset(handle: number, spec: ImageAssetSpec): Promise<void>;
  removeImageAsset(handle: number): Promise<void>;
}

const inertServices: OutputServices = {
  addMp4Source: async () => ({}),
  removeMp4Source: async () => undefined,
  addImageAsset: async () => undefined,
  removeImageAsset: async () => undefined,
};

export type OutputRuntimeInit = {
  outputId: string;
  clock: SmelterClock;
  /** Globally registered inputs (shared across outputs). */
  sharedStreams: StreamDirectory<string>;
  /** Output-scoped inputs minted by components (<Mp4/>); keyed by handle. */
  scopedStreams: StreamDirectory<number>;
  services: OutputServices;
  offline: boolean;
  log: Logger;
};

export class OutputRuntime {
  public readonly outputId: string;
  public readonly clock: SmelterClock;
  public readonly sharedStreams: StreamDirectory<string>;
  public readonly scopedStreams: StreamDirectory<number>;
  public readonly mixer = new AudioMix();
  public readonly keepAlive = new KeepAlive();
  public readonly offline: boolean;
  public readonly log: Logger;
  private services: OutputServices;
  private nextHandle = 1;

  constructor(init: OutputRuntimeInit) {
    this.outputId = init.outputId;
    this.clock = init.clock;
    this.sharedStreams = init.sharedStreams;
    this.scopedStreams = init.scopedStreams;
    this.services = init.services;
    this.offline = init.offline;
    this.log = init.log;
  }

  /** Allocate a handle for an output-scoped resource. */
  public allocHandle(): number {
    return this.nextHandle++;
  }

  public addMp4Source(
    handle: number,
    spec: Mp4SourceSpec
  ): Promise<{ videoDurationMs?: number; audioDurationMs?: number }> {
    return this.services.addMp4Source(handle, spec);
  }

  public removeMp4Source(handle: number): Promise<void> {
    return this.services.removeMp4Source(handle);
  }

  public addImageAsset(handle: number, spec: ImageAssetSpec): Promise<void> {
    return this.services.addImageAsset(handle, spec);
  }

  public removeImageAsset(handle: number): Promise<void> {
    return this.services.removeImageAsset(handle);
  }

  /** Inert runtime so components render outside an output tree. */
  public static detached(): OutputRuntime {
    return new OutputRuntime({
      outputId: '',
      clock: new WallClock(),
      sharedStreams: new LiveStreamDirectory<string>(),
      scopedStreams: new LiveStreamDirectory<number>(),
      services: inertServices,
      offline: false,
      log: noopLogger,
    });
  }
}

export const RuntimeContext = createContext<OutputRuntime>(OutputRuntime.detached());

export function useRuntime(): OutputRuntime {
  return useContext(RuntimeContext);
}
