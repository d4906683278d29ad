/** /ws event channel over the browser-native WebSocket. */
import type { Logger } from '@smelter-tpu/smelter-core';

export class WebSocketConnection {
  private url: URL;
  private listeners = new Set<(event: object) => void>();
  private ws: WebSocket | null = null;
  private closed?: Promise<void>;

  constructor(url: URL) {
    this.url = url;
  }

  public async connect(logger: Logger): Promise<void> {
    const ws = new WebSocket(this.url);
    let connected = false;
    await new Promise<void>((resolve, reject) => {
      ws.addEventListener('error', (error: unknown) => {
        if (connected) {
          logger.error(error, 'WebSocket error');
        } else {
          reject(error);
        }
      });
      ws.addEventListener('open', () => {
        connected = true;
        resolve();
      });
      ws.addEventListener('message', (message: MessageEvent) => {
        let event: object;
        try {
          event = JSON.parse(String(message.data));
        } catch {
          logger.warn({ data: message.data }, 'Malformed websocket event');
          return;
        }
        for (const listener of this.listeners) {
          listener(event);
        }
      });
      this.closed = new Promise(resolveClose => {
        ws.addEventListener('close', () => {
          this.ws = null;
          resolveClose();
        });
      });
    });
    this.ws = ws;
  }

  public registerEventListener(cb: (event: object) => void): void {
    this.listeners.add(cb);
  }

  public async close(): Promise<void> {
    this.ws?.close();
    await this.closed;
  }
}
