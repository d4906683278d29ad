/**
 * Platform-neutral /ws event stream. Environment packages supply a
 * ~10-line SocketAdapter (node `ws`, browser WebSocket, ...); this class
 * owns the connect handshake, JSON decode, and listener fan-out, so the
 * per-platform files carry no protocol logic.
 */
import type { Logger } from './logger.js';

/** Raw-socket shim an environment package provides. */
export type SocketAdapter = (handlers: SocketHandlers) => SocketLink;

export type SocketHandlers = {
  onOpen(): void;
  onError(error: unknown): void;
  onText(text: string): void;
  onClose(): void;
};

export type SocketLink = {
  close(): void;
};

export class JsonEventStream {
  private fanout = new Set<(event: object) => void>();
  private link: SocketLink | null = null;
  private finished?: Promise<void>;

  constructor(private adapter: SocketAdapter) {}

  /** Resolves once the socket is open; rejects on a pre-open failure. */
  public async start(logger: Logger): Promise<void> {
    let settle!: { ok(): void; fail(error: unknown): void };
    const opened = new Promise<void>((resolve, reject) => {
      settle = { ok: resolve, fail: reject };
    });
    let open = false;
    let closeResolved!: () => void;
    this.finished = new Promise<void>(resolve => (closeResolved = resolve));

    this.link = this.adapter({
      onOpen: () => {
        open = true;
        settle.ok();
      },
      onError: error => {
        if (!open) settle.fail(error);
        else logger.error(error, 'WebSocket error');
      },
      onText: text => this.deliver(text, logger),
      onClose: () => {
        this.link = null;
        closeResolved();
      },
    });
    await opened;
  }

  private deliver(text: string, logger: Logger): void {
    let event: object;
    try {
      event = JSON.parse(text);
    } catch {
      logger.warn({ data: text }, 'Malformed websocket event');
      return;
    }
    this.fanout.forEach(listener => listener(event));
  }

  public subscribe(listener: (event: object) => void): void {
    this.fanout.add(listener);
  }

  /** Close the socket (if open) and wait for the close handshake. */
  public async stop(): Promise<void> {
    this.link?.close();
    await this.finished;
  }
}
