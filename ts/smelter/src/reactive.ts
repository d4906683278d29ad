/**
 * Minimal reactive primitive the whole SDK state model is built on.
 *
 * One `Cell` class backs every piece of observable state (clock ticks,
 * input-stream snapshots, the audio mix, keep-alive counters) instead of
 * each store hand-rolling its own subscribe/getSnapshot pair. React
 * components read cells through `useCell` (useSyncExternalStore under the
 * hood); non-React code calls `watch` directly.
 */
import { useSyncExternalStore } from 'react';

export class Cell<T> {
  private current: T;
  private watchers = new Set<() => void>();

  constructor(initial: T) {
    this.current = initial;
  }

  /** Bound methods so they can be handed to useSyncExternalStore as-is. */
  public read = (): T => this.current;

  public watch = (onChange: () => void): (() => void) => {
    this.watchers.add(onChange);
    return () => {
      this.watchers.delete(onChange);
    };
  };

  public write(next: T): void {
    if (Object.is(next, this.current)) {
      return;
    }
    this.current = next;
    this.ping();
  }

  public swap(fn: (current: T) => T): void {
    this.write(fn(this.current));
  }

  /** Notify watchers without changing the value (time-like cells). */
  public ping(): void {
    for (const watcher of [...this.watchers]) {
      watcher();
    }
  }
}

/** Subscribe a React component to a cell. */
export function useCell<T>(cell: Cell<T>): T {
  return useSyncExternalStore(cell.watch, cell.read);
}
