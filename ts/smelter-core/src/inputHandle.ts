/** Handle returned by registerInput: duration info + pause/resume/seek. */
import type { ApiClient, RegisterInputResponse } from './api.js';
import type { InputRef, RegisterInput } from './api/input.js';

export function newInputHandle(
  inputRef: InputRef,
  api: ApiClient,
  response: RegisterInputResponse,
  kind: RegisterInput['type']
): InputHandle {
  if (kind === 'whip_server') {
    return new WhipInputHandle(inputRef, api, response);
  }
  if (kind === 'mp4') {
    return new Mp4InputHandle(inputRef, api, response);
  }
  return new InputHandle(inputRef, api, response);
}

export class InputHandle {
  protected inputRef: InputRef;
  protected api: ApiClient;
  protected response: RegisterInputResponse;

  constructor(inputRef: InputRef, api: ApiClient, response: RegisterInputResponse) {
    this.inputRef = inputRef;
    this.api = api;
    this.response = response;
  }

  public get videoDurationMs(): number | undefined {
    return this.response.video_duration_ms;
  }

  public get audioDurationMs(): number | undefined {
    return this.response.audio_duration_ms;
  }

  /** Listening port for server-style inputs (rtp/rtmp/moq). */
  public get port(): number | undefined {
    return this.response.port;
  }

  public async pause(): Promise<void> {
    await this.api.updateInput(this.inputRef, { pause: true });
  }

  public async resume(): Promise<void> {
    await this.api.updateInput(this.inputRef, { pause: false });
  }
}

export class Mp4InputHandle extends InputHandle {
  public async seek(seekMs: number): Promise<void> {
    await this.api.updateInput(this.inputRef, { seek_ms: seekMs });
  }
}

export class WhipInputHandle extends InputHandle {
  public get endpointRoute(): string | undefined {
    return this.response.endpoint_route;
  }

  public get bearerToken(): string | undefined {
    return this.response.bearer_token;
  }
}
