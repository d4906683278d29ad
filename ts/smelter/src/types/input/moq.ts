import type { H264Decoder } from './common.js';

export type InputMoqDecoderMap = {
  h264?: H264Decoder;
};
