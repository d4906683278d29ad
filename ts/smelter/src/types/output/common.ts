export type InputId = string;

export type OutputEndCondition =
  | { anyOf: InputId[] }
  | { allOf: InputId[] }
  | { anyInput: boolean }
  | { allInputs: boolean };

export type VideoEncoderBitrate =
  | number
  | { averageBitrate: number; maxBitrate: number };

export type AudioChannels = 'mono' | 'stereo';
export type AudioMixingStrategy = 'sum_clip' | 'sum_scale';
export type H264EncoderPreset =
  | 'ultrafast'
  | 'superfast'
  | 'veryfast'
  | 'faster'
  | 'fast'
  | 'medium'
  | 'slow'
  | 'slower'
  | 'veryslow'
  | 'placebo';
export type OutputPixelFormat = 'yuv420p' | 'yuv422p' | 'yuv444p';
export type OpusEncoderPreset = 'quality' | 'voip' | 'lowest_latency';

export type FfmpegH264EncoderOptions = {
  type: 'ffmpeg_h264';
  bitrate?: VideoEncoderBitrate;
  keyframeIntervalMs?: number;
  preset?: H264EncoderPreset;
  pixelFormat?: OutputPixelFormat;
  ffmpegOptions?: Record<string, string>;
};

export type FfmpegVp8EncoderOptions = {
  type: 'ffmpeg_vp8';
  bitrate?: VideoEncoderBitrate;
  keyframeIntervalMs?: number;
  ffmpegOptions?: Record<string, string>;
};

export type FfmpegVp9EncoderOptions = {
  type: 'ffmpeg_vp9';
  bitrate?: VideoEncoderBitrate;
  keyframeIntervalMs?: number;
  pixelFormat?: OutputPixelFormat;
  ffmpegOptions?: Record<string, string>;
};

export type FfmpegAv1EncoderOptions = {
  type: 'ffmpeg_av1';
  bitrate?: VideoEncoderBitrate;
  keyframeIntervalMs?: number;
  pixelFormat?: OutputPixelFormat;
  ffmpegOptions?: Record<string, string>;
};

export type VideoEncoderOptions =
  | FfmpegH264EncoderOptions
  | FfmpegVp8EncoderOptions
  | FfmpegVp9EncoderOptions
  | FfmpegAv1EncoderOptions;

export type AacEncoderOptions = {
  type: 'aac';
  sampleRate?: number;
};

export type OpusEncoderOptions = {
  type: 'opus';
  preset?: OpusEncoderPreset;
  sampleRate?: number;
  forwardErrorCorrection?: boolean;
  expectedPacketLoss?: number;
};

export type AudioEncoderOptions = AacEncoderOptions | OpusEncoderOptions;
