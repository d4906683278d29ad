/**
 * Transport abstraction the compositors talk through. Implementations live
 * in environment packages (smelter-node spawns/attaches to a server
 * process and bridges its /ws event stream).
 */
import type { Logger } from './logger.js';

export type ApiRequest = {
  method: 'GET' | 'POST';
  route: string;
  body?: object;
  headers?: Record<string, string>;
};

export type MultipartRequest = {
  method: 'POST';
  route: string;
  body: FormData;
  headers?: Record<string, string>;
};

export interface SetupInstanceOptions {
  aheadOfTimeProcessing: boolean;
  logger: Logger;
}

export interface SmelterManager {
  setupInstance(opts: SetupInstanceOptions): Promise<void>;
  sendRequest(request: ApiRequest): Promise<object>;
  sendMultipartRequest(request: MultipartRequest): Promise<object>;
  registerEventListener(cb: (event: unknown) => void): void;
  terminate(): Promise<void>;
}
