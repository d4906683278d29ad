export type RtpVideoDecoder =
  | 'ffmpeg_h264'
  | 'ffmpeg_vp8'
  | 'ffmpeg_vp9'
  | 'ffmpeg_av1'
  | 'vulkan_h264';

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
