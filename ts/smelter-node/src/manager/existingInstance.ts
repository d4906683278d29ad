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

function serverUrl(raw: string | URL): URL {
  const url = raw instanceof URL ? raw : new URL(raw);
  if (url.protocol !== 'http:' && url.protocol !== 'https:') {
    throw new Error('Expected url to use either http or https protocol');
  }
  return url;
}

function eventsUrl(server: URL): URL {
  const ws = joinUrl(server, 'ws');
  ws.protocol = server.protocol === 'https:' ? 'wss:' : 'ws:';
  return ws;
}

export default class ExistingInstanceManager implements SmelterManager {
  private url: URL;
  private auth?: string;
  private events: WebSocketConnection;

  constructor(opts: ExistingInstanceOptions) {
    this.url = serverUrl(opts.url);
    this.auth = opts.authorizationHeader;
    this.events = new WebSocketConnection(eventsUrl(this.url), this.auth);
  }

  public async setupInstance(opts: SetupInstanceOptions): Promise<void> {
    const status = await retry(async () => {
      await sleep(500);
      return getSmelterStatus(this);
    }, 10);
    if (status.configuration.aheadOfTimeProcessing !== opts.aheadOfTimeProcessing) {
      opts.logger.warn(
        {
          expected: opts.aheadOfTimeProcessing,
          actual: status.configuration.aheadOfTimeProcessing,
        },
        'Mismatch between instance config and SDK (ahead_of_time_processing).'
      );
    }

    // clear any state from a previous SDK session sharing this instance
    await this.sendRequest({ method: 'POST', route: '/api/reset', body: {} });
    opts.logger.info('Sent reset request to the Smelter instance.');

    await this.events.connect(opts.logger);
  }

  private withAuth<R extends ApiRequest | MultipartRequest>(request: R): R {
    if (!this.auth) return request;
    return { ...request, headers: { ...request.headers, Authorization: this.auth } };
  }

  public sendRequest(request: ApiRequest): Promise<object> {
    return sendRequest(this.url, this.withAuth(request));
  }

  public sendMultipartRequest(request: MultipartRequest): Promise<object> {
    return sendMultipartRequest(this.url, this.withAuth(request));
  }

  public registerEventListener(cb: (event: unknown) => void): void {
    this.events.registerEventListener(cb);
  }

  public terminate(): Promise<void> {
    return this.events.close();
  }
}
