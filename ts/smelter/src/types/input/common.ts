/**
 * Shared input-registration building blocks: decoder choices per protocol
 * and the side-channel options. Consolidated here (one module) instead of
 * one file per protocol — the maps are all one-liners over H264Decoder.
 */

export type H264Decoder = 'ffmpeg_h264' | 'vulkan_h264';

export type RtpVideoDecoder =
  | 'ffmpeg_h264'
  | 'ffmpeg_vp8'
  | 'ffmpeg_vp9'
  | 'ffmpeg_av1'
  | 'vulkan_h264';

export type WhipVideoDecoder = RtpVideoDecoder | 'any';
export type WhepVideoDecoder = RtpVideoDecoder | 'any';

/** Codec -> decoder overrides for container/stream inputs. */
export type InputMp4DecoderMap = { h264?: H264Decoder };
export type InputHlsDecoderMap = { h264?: H264Decoder };
export type InputRtmpDecoderMap = { h264?: H264Decoder };
export type InputMoqDecoderMap = { h264?: H264Decoder };

export type InputRtpVideoOptions = {
  decoder: RtpVideoDecoder;
};

export type InputRtpAudioOptions =
  | { decoder: 'opus'; forwardErrorCorrection?: boolean }
  | ({ decoder: 'aac' } & InputRtpAudioAacOptions);

export type InputRtpAudioAacOptions = {
  /** AAC AudioSpecificConfig as a hex string (RFC 3640 out-of-band). */
  audioSpecificConfig: string;
  rtpMode?: 'low_bitrate' | 'high_bitrate' | null;
};

export type InputWhipVideoOptions = {
  decoderPreferences?: WhipVideoDecoder[] | null;
};

export type InputWhepVideoOptions = {
  decoderPreferences?: WhepVideoDecoder[] | null;
};

/** Publish decoded frames/PCM for this input on a unix side channel. */
export type SideChannel = {
  video?: boolean;
  audio?: boolean;
  delayMs?: number;
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
  sideChannel?: SideChannel;
};
