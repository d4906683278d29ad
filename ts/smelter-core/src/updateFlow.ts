/** Async coordination primitives for the output drivers and facades. */
import type { Logger } from './logger.js';

export function sleep(timeoutMs: number): Promise<void> {
  return new Promise<void>(resolve => setTimeout(resolve, timeoutMs));
}

/**
 * Coalescing scene pusher. React commits call `mark()` freely; at most one
 * send runs at a time, bursts collapse into one pending send, and sends are
 * spaced at least `minGapMs` apart. Until `attach()` provides a transport
 * (the output's register call must finish first), marks only accumulate.
 */
export class SceneSync {
  private send: (() => Promise<void>) | null = null;
  private marked = false;
  private pump: Promise<void> | null = null;
  private minGapMs: number;
  private logger: Logger;

  constructor(minGapMs: number, logger: Logger) {
    this.minGapMs = minGapMs;
    this.logger = logger;
  }

  public mark(): void {
    this.marked = true;
    this.kick();
  }

  /** Install the transport; any accumulated mark is flushed immediately. */
  public attach(send: () => Promise<void>): void {
    this.send = send;
    this.kick();
  }

  /** Stop sending; marks accumulate again (used during shutdown). */
  public detach(): void {
    this.send = null;
  }

  /** Resolves when no send is running and nothing is marked. */
  public async settle(): Promise<void> {
    while (this.pump) {
      await this.pump;
    }
  }

  private kick(): void {
    if (this.pump || !this.marked || !this.send) {
      return;
    }
    this.pump = this.loop();
  }

  private async loop(): Promise<void> {
    while (this.marked && this.send) {
      this.marked = false;
      const startedAt = Date.now();
      try {
        await this.send();
      } catch (error) {
        this.logger.error(error);
      }
      const gapLeft = startedAt + this.minGapMs - Date.now();
      if (gapLeft > 0) {
        await sleep(gapLeft);
      }
    }
    this.pump = null;
    // a mark may have landed between the loop condition and clearing pump
    this.kick();
  }
}

/**
 * Tracks burst activity: `touch()` on every event, `async quiet(ms)`
 * resolves once no touch has occurred for `ms`. The offline driver uses it
 * to wait for a React render cascade to settle before serializing.
 */
export class ActivityMonitor {
  private lastTouch = 0;

  public touch(): void {
    this.lastTouch = Date.now();
  }

  public async quiet(windowMs: number): Promise<void> {
    for (;;) {
      const elapsed = Date.now() - this.lastTouch;
      if (elapsed >= windowMs) {
        return;
      }
      await sleep(windowMs - elapsed);
    }
  }
}

type GateTask = {
  exclusive: boolean;
  start: () => void;
  finished: Promise<unknown>;
};

/**
 * Read/write-style async gate: `exclusively()` tasks run alone,
 * `concurrently()` tasks may overlap with each other. FIFO fairness: a
 * queued exclusive task blocks later shared tasks from jumping ahead.
 */
export class AccessGate {
  private queue: GateTask[] = [];
  private runningShared = 0;
  private runningExclusive = false;

  public exclusively<T>(fn: () => Promise<T>): Promise<T> {
    return this.enqueue(true, fn);
  }

  public concurrently<T>(fn: () => Promise<T>): Promise<T> {
    return this.enqueue(false, fn);
  }

  private enqueue<T>(exclusive: boolean, fn: () => Promise<T>): Promise<T> {
    let start!: () => void;
    const gateOpen = new Promise<void>(resolve => {
      start = resolve;
    });
    const result = (async () => {
      await gateOpen;
      try {
        return await fn();
      } finally {
        if (exclusive) {
          this.runningExclusive = false;
        } else {
          this.runningShared -= 1;
        }
        this.dispatch();
      }
    })();
    this.queue.push({ exclusive, start, finished: result.catch(() => undefined) });
    this.dispatch();
    return result;
  }

  private dispatch(): void {
    while (this.queue.length > 0 && !this.runningExclusive) {
      const next = this.queue[0];
      if (next.exclusive) {
        if (this.runningShared > 0) {
          return;
        }
        this.runningExclusive = true;
      } else {
        this.runningShared += 1;
      }
      this.queue.shift();
      next.start();
    }
  }
}
