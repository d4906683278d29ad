/**
 * Handles returned by registerInput. A handle wraps the register response
 * (durations, ports, tokens) and the control routes every input supports
 * (pause/resume via /api/input/:id/update); protocol-specific subclasses
 * add seek (MP4) and WHIP endpoint accessors.
 */
import type { ApiClient, RegisterInputResponse } from './api.js';
import type { InputRef, RegisterInput } from './api/input.js';

export class InputHandle {
  protected readonly inputRef: InputRef;
  protected readonly api: ApiClient;
  protected readonly response: RegisterInputResponse;

  constructor(inputRef: InputRef, api: ApiClient, response: RegisterInputResponse) {
    this.inputRef = inputRef;
    this.api = api;
    this.response = response;
  }

  /** Media durations from the register response (container inputs). */
  public get videoDurationMs(): number | undefined {
    return this.response.video_duration_ms;
  }

  public get audioDurationMs(): number | undefined {
    return this.response.audio_duration_ms;
  }

  /** Listening port for server-style inputs (rtp/rtmp/moq servers). */
  public get port(): number | undefined {
    return this.response.port;
  }

  public pause(): Promise<void> {
    return this.update({ pause: true });
  }

  public resume(): Promise<void> {
    return this.update({ pause: false });
  }

  protected async update(body: { pause?: boolean; seek_ms?: number }): Promise<void> {
    await this.api.updateInput(this.inputRef, body);
  }
}

export class Mp4InputHandle extends InputHandle {
  public seek(seekMs: number): Promise<void> {
    return this.update({ seek_ms: seekMs });
  }
}

export class WhipInputHandle extends InputHandle {
  /** Route WHIP publishers POST their offer to. */
  public get endpointRoute(): string | undefined {
    return this.response.endpoint_route;
  }

  /** Bearer token publishers must present (generated when not supplied). */
  public get bearerToken(): string | undefined {
    return this.response.bearer_token;
  }
}

const HANDLE_CLASSES: Partial<
  Record<RegisterInput['type'], typeof InputHandle>
> = {
  mp4: Mp4InputHandle,
  whip_server: WhipInputHandle,
};

export function newInputHandle(
  inputRef: InputRef,
  api: ApiClient,
  response: RegisterInputResponse,
  kind: RegisterInput['type']
): InputHandle {
  const cls = HANDLE_CLASSES[kind] ?? InputHandle;
  return new cls(inputRef, api, response);
}
