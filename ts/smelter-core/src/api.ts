/**
 * Typed request layer over the server's HTTP API. Every endpoint follows
 * the server's `/api/<entity>/<id>/<verb>` shape (smelter_tpu/server/app.py
 * route table), so the client is a thin entity-route builder plus typed
 * wrappers — no per-endpoint request plumbing.
 */
import { Api, _smelterInternals } from '@smelter-tpu/smelter';
import type { InputRef, RegisterInputRequest } from './api/input.js';
import { inputRefIntoRawId } from './api/input.js';
import type { RegisterOutputRequest } from './api/output.js';
import type { Logger } from './logger.js';

type ImageRef = _smelterInternals.ImageRef;
const imageRefIntoRawId = _smelterInternals.imageRefIntoRawId;

export { Api };

// --- transport contract -----------------------------------------------------
// Implementations live in environment packages: smelter-node spawns or
// attaches to a server process and bridges its /ws event stream;
// smelter-web-client rides fetch + the browser WebSocket.

type Exchange<B> = {
  method: string;
  route: string;
  body?: B;
  headers?: Record<string, string>;
};

/** One HTTP exchange with the server, JSON body. */
export type ApiRequest = Exchange<object> & { method: 'GET' | 'POST' };

/** One HTTP exchange carrying multipart form data (file delivery). */
export type MultipartRequest = Exchange<FormData> & { method: 'POST'; body: FormData };

export interface SetupInstanceOptions {
  aheadOfTimeProcessing: boolean;
  logger: Logger;
}

export interface SmelterManager {
  setupInstance(opts: SetupInstanceOptions): Promise<void>;
  sendRequest(request: ApiRequest): Promise<object>;
  sendMultipartRequest(request: MultipartRequest): Promise<object>;
  registerEventListener(cb: (event: unknown) => void): void;
  terminate(): Promise<void>;
}

export type RegisterInputResponse = {
  video_duration_ms?: number;
  audio_duration_ms?: number;
  // WHIP server inputs
  endpoint_route?: string;
  bearer_token?: string;
  // port-bound inputs (rtp/rtmp/moq servers)
  port?: number;
};

export type RegisterOutputResponse = {
  endpoint_route?: string;
  port?: number;
};

type Entity = 'input' | 'output' | 'shader' | 'image' | 'web-renderer';

export class ApiClient {
  constructor(private transport: SmelterManager) {}

  /** `/api/<entity>/<id>/<verb>` — the server's uniform resource shape. */
  private act(entity: Entity, id: string, verb: string, body: object): Promise<object> {
    const route = `/api/${entity}/${encodeURIComponent(id)}/${verb}`;
    return this.transport.sendRequest({ method: 'POST', route, body });
  }

  private post(route: string, body: object): Promise<object> {
    return this.transport.sendRequest({ method: 'POST', route, body });
  }

  private get(route: string): Promise<object> {
    return this.transport.sendRequest({ method: 'GET', route });
  }

  // --- outputs ---

  public updateScene(outputId: string, request: Api.UpdateOutputRequest): Promise<object> {
    return this.act('output', outputId, 'update', request);
  }

  public registerOutput(
    outputId: string,
    request: RegisterOutputRequest
  ): Promise<RegisterOutputResponse> {
    return this.act('output', outputId, 'register', request) as Promise<RegisterOutputResponse>;
  }

  public unregisterOutput(
    outputId: string,
    body: { schedule_time_ms?: number }
  ): Promise<object> {
    return this.act('output', outputId, 'unregister', body);
  }

  public requestKeyframe(outputId: string): Promise<object> {
    return this.act('output', outputId, 'request_keyframe', {});
  }

  // --- inputs ---

  public registerInput(
    ref: InputRef,
    request: RegisterInputRequest
  ): Promise<RegisterInputResponse> {
    return this.act('input', inputRefIntoRawId(ref), 'register',
                    request) as Promise<RegisterInputResponse>;
  }

  public updateInput(
    ref: InputRef,
    request: { pause?: boolean; seek_ms?: number }
  ): Promise<object> {
    return this.act('input', inputRefIntoRawId(ref), 'update', request);
  }

  public unregisterInput(
    ref: InputRef,
    body: { schedule_time_ms?: number }
  ): Promise<object> {
    return this.act('input', inputRefIntoRawId(ref), 'unregister', body);
  }

  // --- renderer resources ---

  public registerShader(shaderId: string, request: Api.ShaderSpec): Promise<object> {
    return this.act('shader', shaderId, 'register', request);
  }

  public unregisterShader(shaderId: string): Promise<object> {
    return this.act('shader', shaderId, 'unregister', {});
  }

  public registerImage(ref: ImageRef, request: Api.ImageSpec): Promise<object> {
    return this.act('image', imageRefIntoRawId(ref), 'register', request);
  }

  public unregisterImage(ref: ImageRef, body: { schedule_time_ms?: number }): Promise<object> {
    return this.act('image', imageRefIntoRawId(ref), 'unregister', body);
  }

  public registerWebRenderer(instanceId: string, request: Api.WebRendererSpec): Promise<object> {
    return this.act('web-renderer', instanceId, 'register', request);
  }

  public unregisterWebRenderer(instanceId: string): Promise<object> {
    return this.act('web-renderer', instanceId, 'unregister', {});
  }

  public registerFont(request: Api.FontSpec): Promise<object> {
    return this.post('/api/font/register', request);
  }

  // --- instance-wide ---

  public async start(): Promise<void> {
    await this.post('/api/start', {});
  }

  public async reset(): Promise<void> {
    await this.post('/api/reset', {});
  }

  public stats(): Promise<object> {
    return this.get('/stats');
  }

  public status(): Promise<object> {
    return this.get('/status');
  }
}
