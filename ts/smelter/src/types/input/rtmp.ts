import type { H264Decoder } from './common.js';

export type InputRtmpDecoderMap = {
  h264?: H264Decoder;
};
