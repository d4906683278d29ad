/** Browser adapter for the core JsonEventStream (native WebSocket). */
import type { Logger, SocketAdapter } from '@smelter-tpu/smelter-core';
import { JsonEventStream } from '@smelter-tpu/smelter-core';

function browserSocket(url: URL): SocketAdapter {
  return handlers => {
    const ws = new WebSocket(url);
    ws.addEventListener('open', handlers.onOpen);
    ws.addEventListener('error', handlers.onError);
    ws.addEventListener('message', msg => handlers.onText(String(msg.data)));
    ws.addEventListener('close', handlers.onClose);
    return { close: () => ws.close() };
  };
}

export class WebSocketConnection {
  private stream: JsonEventStream;

  constructor(url: URL) {
    this.stream = new JsonEventStream(browserSocket(url));
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
