/** Attach to an already-running smelter-tpu server. */
import type {
  ApiRequest,
  MultipartRequest,
  SetupInstanceOptions,
  SmelterManager,
} from '@smelter-tpu/smelter-core';
import { joinUrl, sendMultipartRequest, sendRequest } from '../fetch.js';
import { getSmelterStatus } from '../getSmelterStatus.js';
import { retry, sleep } from '../utils.js';
import { WebSocketConnection } from '../ws.js';

export type ExistingInstanceOptions = {
  url: string | URL;
  authorizationHeader?: string;
};

export default class ExistingInstanceManager implements SmelterManager {
  private url: URL;
  private authorizationHeader?: string;
  private wsConnection: WebSocketConnection;

  constructor(opts: ExistingInstanceOptions) {
    const url = opts.url instanceof URL ? opts.url : new URL(opts.url);
    if (url.protocol !== 'http:' && url.protocol !== 'https:') {
      throw new Error('Expected url to use either http or https protocol');
    }
    this.url = url;
    this.authorizationHeader = opts.authorizationHeader;
    const wsUrl = joinUrl(url, 'ws');
    wsUrl.protocol = url.protocol === 'https:' ? 'wss:' : 'ws:';
    this.wsConnection = new WebSocketConnection(wsUrl, opts.authorizationHeader);
  }

  public async setupInstance(opts: SetupInstanceOptions): Promise<void> {
    await retry(async () => {
      await sleep(500);
      const status = await getSmelterStatus(this);
      if (status.configuration.aheadOfTimeProcessing !== opts.aheadOfTimeProcessing) {
        opts.logger.warn(
          {
            expected: opts.aheadOfTimeProcessing,
            actual: status.configuration.aheadOfTimeProcessing,
          },
          'Mismatch between instance config and SDK (ahead_of_time_processing).'
        );
      }
      return status;
    }, 10);

    // clear any state from a previous SDK session sharing this instance
    await this.sendRequest({ method: 'POST', route: '/api/reset', body: {} });
    opts.logger.info('Sent reset request to the Smelter instance.');

    await this.wsConnection.connect(opts.logger);
  }

  public async sendRequest(request: ApiRequest): Promise<object> {
    return sendRequest(this.url, {
      ...request,
      headers: {
        ...request.headers,
        ...(this.authorizationHeader
          ? { Authorization: this.authorizationHeader }
          : {}),
      },
    });
  }

  public async sendMultipartRequest(request: MultipartRequest): Promise<object> {
    return sendMultipartRequest(this.url, {
      ...request,
      headers: {
        ...request.headers,
        ...(this.authorizationHeader
          ? { Authorization: this.authorizationHeader }
          : {}),
      },
    });
  }

  public registerEventListener(cb: (event: unknown) => void): void {
    this.wsConnection.registerEventListener(cb);
  }

  public async terminate(): Promise<void> {
    await this.wsConnection.close();
  }
}
