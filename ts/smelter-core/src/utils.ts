/** Async utilities shared by the compositors. */
import type { Logger } from './logger.js';

export async function sleep(timeoutMs: number): Promise<void> {
  await new Promise<void>(resolve => setTimeout(resolve, timeoutMs));
}

type ThrottleOptions = {
  logger: Logger;
  timeoutMs: number;
};

/**
 * Coalesces bursts of scheduleCall() into sequential invocations of `fn`
 * at most once per `timeoutMs` — scene updates from rapid React commits
 * collapse into one request in flight plus at most one pending.
 */
export class ThrottledFunction {
  private fn: () => Promise<void>;
  private pending = false;
  private running?: Promise<void>;
  private opts: ThrottleOptions;

  constructor(fn: () => Promise<void>, opts: ThrottleOptions) {
    this.fn = fn;
    this.opts = opts;
  }

  public scheduleCall(): void {
    this.pending = true;
    if (!this.running) {
      this.running = this.drain();
    }
  }

  public async waitForPendingCalls(): Promise<void> {
    while (this.running) {
      await this.running;
    }
  }

  public setFn(fn: () => Promise<void>): void {
    this.fn = fn;
  }

  private async drain(): Promise<void> {
    while (this.pending) {
      const start = Date.now();
      this.pending = false;
      try {
        await this.fn();
      } catch (error) {
        this.opts.logger.error(error);
      }
      const left = start + this.opts.timeoutMs - Date.now();
      if (left > 0) {
        await sleep(left);
      }
      this.running = undefined;
    }
  }
}

/**
 * Reader/writer-style async guard: `runBlocking` runs exclusively,
 * `run` calls may share.
 */
export class StateGuard {
  private state:
    | { type: 'open' }
    | { type: 'unique'; promise: Promise<void> }
    | { type: 'shared'; promises: Set<Promise<void>> } = { type: 'open' };

  public async runBlocking<T>(fn: () => Promise<T>): Promise<T> {
    const [promise, release] = newGuardPromise();
    for (;;) {
      if (this.state.type === 'open') {
        break;
      }
      if (this.state.type === 'unique') {
        if (this.state.promise === promise) {
          break;
        }
        await this.state.promise;
      } else {
        const holders = this.state.promises;
        this.state = { type: 'unique', promise };
        await Promise.allSettled(holders);
        break;
      }
    }
    this.state = { type: 'unique', promise };
    try {
      return await fn();
    } finally {
      this.state = { type: 'open' };
      release();
    }
  }

  public async run<T>(fn: () => Promise<T>): Promise<T> {
    while (this.state.type === 'unique') {
      await this.state.promise;
    }
    const [promise, release] = newGuardPromise();
    if (this.state.type === 'shared') {
      this.state.promises.add(promise);
    } else {
      this.state = { type: 'shared', promises: new Set([promise]) };
    }
    try {
      return await fn();
    } finally {
      if (this.state.type === 'shared') {
        this.state.promises.delete(promise);
        if (this.state.promises.size === 0) {
          this.state = { type: 'open' };
        }
      }
      release();
    }
  }
}

function newGuardPromise(): [Promise<void>, () => void] {
  let release!: () => void;
  const promise = new Promise<void>(resolve => {
    release = resolve;
  });
  return [promise, release];
}
