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

export default class RemoteInstanceManager implements SmelterManager {
  private url: URL;
  private wsConnection: WebSocketConnection;

  constructor(opts: SmelterOptions) {
    const url = opts.url instanceof URL ? opts.url : new URL(opts.url);
    if (url.protocol !== 'http:' && url.protocol !== 'https:') {
      throw new Error('Expected url to use either http or https protocol');
    }
    this.url = url;
    const wsUrl = joinUrl(url, 'ws');
    wsUrl.protocol = url.protocol === 'https:' ? 'wss:' : 'ws:';
    this.wsConnection = new WebSocketConnection(wsUrl);
  }

  public async setupInstance(opts: SetupInstanceOptions): Promise<void> {
    await retry(async () => {
      await sleep(500);
      return this.sendRequest({ method: 'GET', route: '/status' });
    }, 10);
    await this.sendRequest({ method: 'POST', route: '/api/reset', body: {} });
    opts.logger.info('Sent reset request to the Smelter instance.');
    await this.wsConnection.connect(opts.logger);
  }

  public async sendRequest(request: ApiRequest): Promise<object> {
    return sendRequest(this.url, request);
  }

  public async sendMultipartRequest(request: MultipartRequest): Promise<object> {
    return sendMultipartRequest(this.url, request);
  }

  public registerEventListener(cb: (event: unknown) => void): void {
    this.wsConnection.registerEventListener(cb);
  }

  public async terminate(): Promise<void> {
    await this.wsConnection.close();
  }
}
