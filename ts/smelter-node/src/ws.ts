/** Node adapter for the core JsonEventStream, over the `ws` package. */
import type { Logger, SocketAdapter } from '@smelter-tpu/smelter-core';
import { JsonEventStream } from '@smelter-tpu/smelter-core';
import WebSocket from 'ws';

function nodeSocket(url: string | URL, authorizationHeader?: string): SocketAdapter {
  return handlers => {
    const headers = authorizationHeader ? { Authorization: authorizationHeader } : {};
    const ws = new WebSocket(url, { headers });
    ws.on('open', handlers.onOpen);
    ws.on('error', handlers.onError);
    ws.on('message', (data: WebSocket.RawData) => handlers.onText(data.toString()));
    ws.on('close', handlers.onClose);
    return { close: () => ws.close() };
  };
}

export class WebSocketConnection {
  private stream: JsonEventStream;

  constructor(url: string | URL, authorizationHeader?: string) {
    this.stream = new JsonEventStream(nodeSocket(url, authorizationHeader));
  }

  public connect(logger: Logger): Promise<void> {
    return this.stream.start(logger);
  }

  public registerEventListener(cb: (event: object) => void): void {
    this.stream.subscribe(cb);
  }

  public close(): Promise<void> {
    return this.stream.stop();
  }
}
