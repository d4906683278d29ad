/**
 * The per-output React context every Smelter component reads: stores,
 * clocks, the audio mixer, and the register hooks components like <Mp4/>
 * and <Image source=.../> use to create output-scoped resources.
 */
import { createContext } from 'react';
import { AudioContext } from './audioOutputContext.js';
import type { TimeContext } from './timeContext.js';
import { LiveTimeContext } from './timeContext.js';
import { LiveInputStreamStore, type InputStreamStore } from './inputStreamStore.js';
import type { RegisterMp4Input } from '../types/input/common.js';
import type { RegisterImage } from '../types/resource.js';
import type { Logger } from '../types/logger.js';
import { noopLogger } from '../types/logger.js';

export type SmelterOutputContext = {
  globalInputStreamStore: InputStreamStore<string>;
  internalInputStreamStore: InputStreamStore<number>;
  audioContext: AudioContext;
  timeContext: TimeContext;
  outputId: string;
  logger: Logger;

  registerMp4Input: (
    inputId: number,
    request: RegisterMp4Input
  ) => Promise<{ videoDurationMs?: number; audioDurationMs?: number }>;
  unregisterMp4Input: (inputId: number) => Promise<void>;
  registerImage: (imageId: number, request: RegisterImage) => Promise<void>;
  unregisterImage: (imageId: number) => Promise<void>;
};

function detachedContext(): SmelterOutputContext {
  // inert default so components render outside an output tree (tests,
  // storybook-style previews) without crashing; real contexts are provided
  // by smelter-core's OutputRootComponent
  return {
    globalInputStreamStore: new LiveInputStreamStore<string>(noopLogger),
    internalInputStreamStore: new LiveInputStreamStore<number>(noopLogger),
    audioContext: new AudioContext(() => undefined),
    timeContext: new LiveTimeContext(),
    outputId: '',
    logger: noopLogger,
    registerMp4Input: async () => ({}),
    unregisterMp4Input: async () => undefined,
    registerImage: async () => undefined,
    unregisterImage: async () => undefined,
  };
}

export const SmelterContext = createContext<SmelterOutputContext>(detachedContext());
