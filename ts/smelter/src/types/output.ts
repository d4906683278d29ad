/**
 * User-facing (camelCase) output registration types. smelter-core's
 * api/output.ts converts these into wire-format requests (scene JSON is
 * attached by the reconciler).
 */
import type {
  AudioChannels,
  AudioEncoderOptions,
  AudioMixingStrategy,
  OutputEndCondition,
  VideoEncoderOptions,
} from './output/common.js';

export * from './output/common.js';

export type Resolution = { width: number; height: number };

export type OutputVideoOptions = {
  resolution: Resolution;
  sendEosWhen?: OutputEndCondition;
  encoder: VideoEncoderOptions;
};

export type OutputAudioOptions = {
  channels?: AudioChannels | null;
  mixingStrategy?: AudioMixingStrategy | null;
  sendEosWhen?: OutputEndCondition | null;
  encoder: AudioEncoderOptions;
};

export type RegisterRtpOutput = {
  port: number | string;
  ip?: string | null;
  transportProtocol?: 'udp' | 'tcp_server';
  video?: OutputVideoOptions;
  audio?: OutputAudioOptions;
};

export type RegisterMp4Output = {
  serverPath: string;
  video?: OutputVideoOptions;
  audio?: OutputAudioOptions;
  ffmpegOptions?: Record<string, string>;
};

export type RegisterHlsOutput = {
  serverPath: string;
  maxPlaylistSize?: number | null;
  video?: OutputVideoOptions;
  audio?: OutputAudioOptions;
  ffmpegOptions?: Record<string, string>;
};

export type WhipEncoderPreference = VideoEncoderOptions | { type: 'any' };
export type WhipAudioEncoderPreference = AudioEncoderOptions | { type: 'any' };

export type WhipVideoOptions = {
  resolution: Resolution;
  sendEosWhen?: OutputEndCondition | null;
  encoderPreferences?: WhipEncoderPreference[] | null;
};

export type WhipAudioOptions = {
  channels?: AudioChannels | null;
  mixingStrategy?: AudioMixingStrategy | null;
  sendEosWhen?: OutputEndCondition | null;
  encoderPreferences?: WhipAudioEncoderPreference[] | null;
};

export type RegisterWhipClientOutput = {
  endpointUrl: string;
  bearerToken?: string | null;
  video?: WhipVideoOptions | null;
  audio?: true | WhipAudioOptions | null;
};

export type RegisterWhepServerOutput = {
  bearerToken?: string | null;
  video?: WhipVideoOptions | null;
  audio?: WhipAudioOptions | null;
};

export type RegisterRtmpClientOutput = {
  url: string;
  video?: OutputVideoOptions | null;
  audio?: OutputAudioOptions | null;
};

export type MoqOutputContainer = 'legacy' | 'loc' | 'cmaf';

export type RegisterMoqClientOutput = {
  endpointUrl: string;
  broadcastPath: string;
  container?: MoqOutputContainer | null;
  video?: OutputVideoOptions | null;
  audio?: OutputAudioOptions | null;
};

export type RegisterOutput =
  | ({ type: 'rtp_stream' } & RegisterRtpOutput)
  | ({ type: 'mp4' } & RegisterMp4Output)
  | ({ type: 'hls' } & RegisterHlsOutput)
  | ({ type: 'whip_client' } & RegisterWhipClientOutput)
  | ({ type: 'whep_server' } & RegisterWhepServerOutput)
  | ({ type: 'rtmp_client' } & RegisterRtmpClientOutput)
  | ({ type: 'moq_client' } & RegisterMoqClientOutput);
