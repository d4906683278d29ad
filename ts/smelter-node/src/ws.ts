/** /ws event channel: forwards parsed server events to listeners. */
import type { Logger } from '@smelter-tpu/smelter-core';
import WebSocket from 'ws';

export class WebSocketConnection {
  private url: string | URL;
  private authorizationHeader?: string;
  private listeners = new Set<(event: object) => void>();
  private ws: WebSocket | null = null;
  private closed?: Promise<void>;

  constructor(url: string | URL, authorizationHeader?: string) {
    this.url = url;
    this.authorizationHeader = authorizationHeader;
  }

  public async connect(logger: Logger): Promise<void> {
    const ws = new WebSocket(this.url, {
      headers: this.authorizationHeader
        ? { Authorization: this.authorizationHeader }
        : {},
    });
    let connected = false;
    await new Promise<void>((resolve, reject) => {
      ws.on('error', (error: unknown) => {
        if (connected) {
          logger.error(error, 'WebSocket error');
        } else {
          reject(error);
        }
      });
      ws.on('open', () => {
        connected = true;
        resolve();
      });
      ws.on('message', (data: WebSocket.RawData) => {
        let event: object;
        try {
          event = JSON.parse(data.toString());
        } catch {
          logger.warn({ data: data.toString() }, 'Malformed websocket event');
          return;
        }
        for (const listener of this.listeners) {
          listener(event);
        }
      });
      this.closed = new Promise(resolveClose => {
        ws.on('close', () => {
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
