import type { H264Decoder } from './common.js';

export type InputHlsDecoderMap = {
  h264?: H264Decoder;
};
