/** pino-backed logger; SMELTER_SDK_LOG_LEVEL controls verbosity. */
import type { Logger } from '@smelter-tpu/smelter-core';
import { pino } from 'pino';

export function createLogger(): Logger {
  return pino({
    level: process.env.SMELTER_SDK_LOG_LEVEL ?? 'warn',
    transport: process.stdout.isTTY
      ? { target: 'pino/file', options: { destination: 1 } }
      : undefined,
  }) as unknown as Logger;
}
