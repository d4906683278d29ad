/** SmelterManager attaching to a remote smelter-tpu server from a browser. */
import type {
  ApiRequest,
  MultipartRequest,
  SetupInstanceOptions,
  SmelterManager,
} from '@smelter-tpu/smelter-core';
import { joinUrl, sendMultipartRequest, sendRequest } from './fetch.js';
import { retry, sleep } from './utils.js';
import { WebSocketConnection } from './ws.js';

export type SmelterOptions = {
  url: string | URL;
};

function asHttpUrl(raw: string | URL): URL {
  const url = new URL(raw instanceof URL ? raw.toString() : raw);
  if (!['http:', 'https:'].includes(url.protocol)) {
    throw new Error('Expected url to use either http or https protocol');
  }
  return url;
}

function wsUrlFor(base: URL): URL {
  const ws = joinUrl(base, 'ws');
  ws.protocol = base.protocol === 'https:' ? 'wss:' : 'ws:';
  return ws;
}

export default class RemoteInstanceManager implements SmelterManager {
  private baseUrl: URL;
  private events: WebSocketConnection;

  constructor(opts: SmelterOptions) {
    this.baseUrl = asHttpUrl(opts.url);
    this.events = new WebSocketConnection(wsUrlFor(this.baseUrl));
  }

  public async setupInstance(opts: SetupInstanceOptions): Promise<void> {
    // poll until the server answers, clear any prior session state, then
    // attach the event channel
    await retry(async () => {
      await sleep(500);
      return this.sendRequest({ method: 'GET', route: '/status' });
    }, 10);
    await this.sendRequest({ method: 'POST', route: '/api/reset', body: {} });
    opts.logger.info('instance reset; connecting event channel');
    await this.events.connect(opts.logger);
  }

  public sendRequest(request: ApiRequest): Promise<object> {
    return sendRequest(this.baseUrl, request);
  }

  public sendMultipartRequest(request: MultipartRequest): Promise<object> {
    return sendMultipartRequest(this.baseUrl, request);
  }

  public registerEventListener(cb: (event: unknown) => void): void {
    this.events.registerEventListener(cb);
  }

  public async terminate(): Promise<void> {
    await this.events.close();
  }
}
