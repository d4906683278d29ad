/**
 * Typed request layer over the server's HTTP API (routes must match
 * smelter_tpu/server/app.py's route table).
 */
import { Api } from '@smelter-tpu/smelter';
import type { ImageRef } from './api/refs.js';
import { imageRefIntoRawId } from './api/refs.js';
import type { InputRef, RegisterInputRequest } from './api/input.js';
import { inputRefIntoRawId } from './api/input.js';
import type { RegisterOutputRequest } from './api/output.js';
import type { ApiRequest, MultipartRequest, SmelterManager } from './smelterManager.js';

export { Api };
export type { ApiRequest, MultipartRequest };

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

export class ApiClient {
  private manager: SmelterManager;

  constructor(manager: SmelterManager) {
    this.manager = manager;
  }

  public async updateScene(
    outputId: string,
    request: Api.UpdateOutputRequest
  ): Promise<object> {
    return this.manager.sendRequest({
      method: 'POST',
      route: `/api/output/${encodeURIComponent(outputId)}/update`,
      body: request,
    });
  }

  public async registerOutput(
    outputId: string,
    request: RegisterOutputRequest
  ): Promise<RegisterOutputResponse> {
    return this.manager.sendRequest({
      method: 'POST',
      route: `/api/output/${encodeURIComponent(outputId)}/register`,
      body: request,
    }) as Promise<RegisterOutputResponse>;
  }

  public async unregisterOutput(
    outputId: string,
    body: { schedule_time_ms?: number }
  ): Promise<object> {
    return this.manager.sendRequest({
      method: 'POST',
      route: `/api/output/${encodeURIComponent(outputId)}/unregister`,
      body,
    });
  }

  public async requestKeyframe(outputId: string): Promise<object> {
    return this.manager.sendRequest({
      method: 'POST',
      route: `/api/output/${encodeURIComponent(outputId)}/request_keyframe`,
      body: {},
    });
  }

  public async registerInput(
    inputRef: InputRef,
    request: RegisterInputRequest
  ): Promise<RegisterInputResponse> {
    return this.manager.sendRequest({
      method: 'POST',
      route: `/api/input/${encodeURIComponent(inputRefIntoRawId(inputRef))}/register`,
      body: request,
    }) as Promise<RegisterInputResponse>;
  }

  public async updateInput(
    inputRef: InputRef,
    request: { pause?: boolean; seek_ms?: number }
  ): Promise<object> {
    return this.manager.sendRequest({
      method: 'POST',
      route: `/api/input/${encodeURIComponent(inputRefIntoRawId(inputRef))}/update`,
      body: request,
    });
  }

  public async unregisterInput(
    inputRef: InputRef,
    body: { schedule_time_ms?: number }
  ): Promise<object> {
    return this.manager.sendRequest({
      method: 'POST',
      route: `/api/input/${encodeURIComponent(inputRefIntoRawId(inputRef))}/unregister`,
      body,
    });
  }

  public async registerShader(shaderId: string, request: Api.ShaderSpec): Promise<object> {
    return this.manager.sendRequest({
      method: 'POST',
      route: `/api/shader/${encodeURIComponent(shaderId)}/register`,
      body: request,
    });
  }

  public async unregisterShader(shaderId: string): Promise<object> {
    return this.manager.sendRequest({
      method: 'POST',
      route: `/api/shader/${encodeURIComponent(shaderId)}/unregister`,
      body: {},
    });
  }

  public async registerImage(imageRef: ImageRef, request: Api.ImageSpec): Promise<object> {
    return this.manager.sendRequest({
      method: 'POST',
      route: `/api/image/${encodeURIComponent(imageRefIntoRawId(imageRef))}/register`,
      body: request,
    });
  }

  public async unregisterImage(
    imageRef: ImageRef,
    body: { schedule_time_ms?: number }
  ): Promise<object> {
    return this.manager.sendRequest({
      method: 'POST',
      route: `/api/image/${encodeURIComponent(imageRefIntoRawId(imageRef))}/unregister`,
      body,
    });
  }

  public async registerWebRenderer(
    instanceId: string,
    request: Api.WebRendererSpec
  ): Promise<object> {
    return this.manager.sendRequest({
      method: 'POST',
      route: `/api/web-renderer/${encodeURIComponent(instanceId)}/register`,
      body: request,
    });
  }

  public async unregisterWebRenderer(instanceId: string): Promise<object> {
    return this.manager.sendRequest({
      method: 'POST',
      route: `/api/web-renderer/${encodeURIComponent(instanceId)}/unregister`,
      body: {},
    });
  }

  public async registerFont(request: Api.FontSpec): Promise<object> {
    return this.manager.sendRequest({
      method: 'POST',
      route: '/api/font/register',
      body: request,
    });
  }

  public async start(): Promise<void> {
    await this.manager.sendRequest({
      method: 'POST',
      route: '/api/start',
      body: {},
    });
  }

  public async reset(): Promise<void> {
    await this.manager.sendRequest({
      method: 'POST',
      route: '/api/reset',
      body: {},
    });
  }

  public async stats(): Promise<object> {
    return this.manager.sendRequest({ method: 'GET', route: '/stats' });
  }

  public async status(): Promise<object> {
    return this.manager.sendRequest({ method: 'GET', route: '/status' });
  }
}
