import type { H264Decoder } from './common.js';

export type InputMp4DecoderMap = {
  h264?: H264Decoder;
};

export type RegisterMp4Input = {
  /** HTTP(S) source URL (mutually exclusive with serverPath/blob). */
  url?: string | null;
  /** Path on the server host. */
  serverPath?: string | null;
  /** Browser-only source (unsupported on Node). */
  blob?: unknown;
  /** (default false) Loop the file. */
  loop?: boolean | null;
  required?: boolean | null;
  offsetMs?: number | null;
  seekMs?: number | null;
  decoderMap?: InputMp4DecoderMap | null;
  sideChannel?: import('./common.js').SideChannel;
};
