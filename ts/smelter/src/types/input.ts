/**
 * User-facing (camelCase) input registration types. smelter-core's
 * api/input.ts converts these into wire-format requests.
 */
import type {
  InputHlsDecoderMap,
  InputMoqDecoderMap,
  InputRtmpDecoderMap,
  InputRtpAudioOptions,
  InputRtpVideoOptions,
  InputWhepVideoOptions,
  InputWhipVideoOptions,
  RegisterMp4Input,
  SideChannel,
} from './input/common.js';

export * from './input/common.js';

export type PortOrPortRange = number | string;
export type TransportProtocol = 'udp' | 'tcp_server';

export type RegisterRtpInput = {
  /** UDP/TCP port (or "start:end" range) the server listens on. */
  port: PortOrPortRange;
  transportProtocol?: TransportProtocol | null;
  video?: InputRtpVideoOptions | null;
  audio?: InputRtpAudioOptions | null;
  /** (default false) Required inputs delay output production when late. */
  required?: boolean | null;
  /** Offset of this input's start relative to the output timeline. */
  offsetMs?: number | null;
  bufferSizeMs?: number | null;
  sideChannel?: SideChannel;
};

export type RegisterHlsInput = {
  url: string;
  required?: boolean | null;
  offsetMs?: number | null;
  decoderMap?: InputHlsDecoderMap | null;
  sideChannel?: SideChannel;
};

export type RegisterWhipServerInput = {
  video?: InputWhipVideoOptions | null;
  /** Token WHIP publishers must present; generated when omitted. */
  bearerToken?: string;
  required?: boolean | null;
  bufferSizeMs?: number | null;
  sideChannel?: SideChannel;
};

export type RegisterWhepClientInput = {
  endpointUrl: string;
  bearerToken?: string;
  video?: InputWhepVideoOptions | null;
  required?: boolean | null;
  bufferSizeMs?: number | null;
  sideChannel?: SideChannel;
};

export type RegisterRtmpServerInput = {
  streamKey?: string;
  port?: number;
  app?: string;
  required?: boolean | null;
  offsetMs?: number | null;
  decoderMap?: InputRtmpDecoderMap | null;
  sideChannel?: SideChannel;
};

export type RegisterMoqServerInput = {
  authToken: string;
  required?: boolean | null;
  decoderMap?: InputMoqDecoderMap | null;
  sideChannel?: SideChannel;
};

export type RegisterMoqClientInput = {
  endpointUrl: string;
  broadcastPath: string;
  required?: boolean | null;
  decoderMap?: InputMoqDecoderMap | null;
  sideChannel?: SideChannel;
};

export type RegisterV4l2Input = {
  path?: string;
  format?: string;
  resolution?: { width: number; height: number } | null;
  framerate?: number | null;
  required?: boolean | null;
  sideChannel?: SideChannel;
};

export type RegisterInput =
  | ({ type: 'rtp_stream' } & RegisterRtpInput)
  | ({ type: 'mp4' } & RegisterMp4Input)
  | ({ type: 'hls' } & RegisterHlsInput)
  | ({ type: 'whip_server' } & RegisterWhipServerInput)
  | ({ type: 'whep_client' } & RegisterWhepClientInput)
  | ({ type: 'rtmp_server' } & RegisterRtmpServerInput)
  | ({ type: 'moq_server' } & RegisterMoqServerInput)
  | ({ type: 'moq_client' } & RegisterMoqClientInput)
  | ({ type: 'v4l2' } & RegisterV4l2Input);
