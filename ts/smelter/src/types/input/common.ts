export type H264Decoder = 'ffmpeg_h264' | 'vulkan_h264';

/** Publish decoded frames/PCM for this input on a unix side channel. */
export type SideChannel = {
  video?: boolean;
  audio?: boolean;
  delayMs?: number;
};
