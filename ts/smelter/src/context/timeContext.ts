/**
 * Time sources for hooks. Live mode: wall clock relative to
 * Smelter.start(), with scheduled re-render notifications for registered
 * timestamps. Offline mode: rendering steps from timestamp to timestamp;
 * blocking tasks (async registrations) hold the step until they finish.
 */
import type { Logger } from '../types/logger.js';

export interface BlockingTask {
  done(): void;
}

type TimestampObject = { timestamp: number };
type Timeout = ReturnType<typeof setTimeout>;

export interface TimeContext {
  timestampMs(): number;
  addTimestamp(timestamp: TimestampObject): void;
  removeTimestamp(timestamp: TimestampObject): void;
  getSnapshot: () => number;
  subscribe: (onStoreChange: () => void) => () => void;
}

export class OfflineTimeContext implements TimeContext {
  private timestamps: TimestampObject[] = [];
  private tasks: BlockingTask[] = [];
  private currentTimestamp = 0;
  private listeners = new Set<() => void>();
  private onChange: () => void;
  private logger: Logger;

  constructor(
    onChange: () => void,
    onTimeChange: (timestampMs: number) => void,
    logger: Logger
  ) {
    this.onChange = onChange;
    this.logger = logger;
    this.listeners.add(() => onTimeChange(this.currentTimestamp));
  }

  public timestampMs(): number {
    return this.currentTimestamp;
  }

  public isBlocked(): boolean {
    return this.tasks.length > 0;
  }

  public newBlockingTask(): BlockingTask {
    this.logger.trace('Start new blocking task');
    const task: BlockingTask = {
      done: () => {
        const before = this.tasks.length;
        this.tasks = this.tasks.filter(t => t !== task);
        if (this.tasks.length < before) {
          this.logger.trace('Blocking task finished');
          if (this.tasks.length === 0) {
            this.onChange();
          }
        }
      },
    };
    this.tasks.push(task);
    return task;
  }

  public addTimestamp(timestamp: TimestampObject): void {
    this.timestamps.push(timestamp);
  }

  public removeTimestamp(timestamp: TimestampObject): void {
    this.timestamps = this.timestamps.filter(t => t !== timestamp);
  }

  /** Advance to the nearest registered timestamp after the current one. */
  public setNextTimestamp(): void {
    let next = Infinity;
    for (const t of this.timestamps) {
      if (t.timestamp > this.currentTimestamp && t.timestamp < next) {
        next = t.timestamp;
      }
    }
    this.logger.debug({ timestampMs: next }, 'Rendering new timestamp');
    this.currentTimestamp = next;
    for (const listener of this.listeners) {
      listener();
    }
  }

  public getSnapshot = (): number => this.currentTimestamp;

  public subscribe = (onStoreChange: () => void): (() => void) => {
    this.listeners.add(onStoreChange);
    return () => this.listeners.delete(onStoreChange);
  };
}

export class LiveTimeContext implements TimeContext {
  private startTimestampMs = 0;
  private scheduled: Array<{ timestamp: TimestampObject; timeout?: Timeout }> = [];
  private listeners = new Set<() => void>();

  public timestampMs(): number {
    return this.startTimestampMs ? Date.now() - this.startTimestampMs : 0;
  }

  public initClock(timestampMs: number): void {
    this.startTimestampMs = timestampMs;
  }

  public addTimestamp(timestamp: TimestampObject): void {
    this.scheduled.push({
      timestamp,
      timeout: this.scheduleNotification(timestamp.timestamp),
    });
  }

  public removeTimestamp(timestamp: TimestampObject): void {
    for (const entry of this.scheduled) {
      if (entry.timestamp === timestamp && entry.timeout !== undefined) {
        clearTimeout(entry.timeout);
      }
    }
    this.scheduled = this.scheduled.filter(entry => entry.timestamp !== timestamp);
  }

  private scheduleNotification(timestampMs: number): Timeout | undefined {
    const timeLeft = timestampMs - this.timestampMs();
    if (timeLeft < 0) {
      return undefined;
    }
    // +300 ms margin so the re-render lands safely after the timestamp
    return setTimeout(() => {
      for (const listener of this.listeners) {
        listener();
      }
    }, timeLeft + 300);
  }

  public getSnapshot = (): number => this.timestampMs();

  public subscribe = (onStoreChange: () => void): (() => void) => {
    this.listeners.add(onStoreChange);
    return () => this.listeners.delete(onStoreChange);
  };
}
