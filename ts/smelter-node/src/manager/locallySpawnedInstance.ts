/**
 * Spawn a local smelter-tpu server (`python -m smelter_tpu.server`) and
 * manage its lifetime. The reference downloads a prebuilt binary; here the
 * server is the Python package, selected via SMELTER_TPU_PYTHON /
 * SMELTER_TPU_PATH or an explicit executablePath.
 */
import type {
  ApiRequest,
  MultipartRequest,
  SetupInstanceOptions,
  SmelterManager,
} from '@smelter-tpu/smelter-core';
import { sendMultipartRequest, sendRequest } from '../fetch.js';
import { getSmelterStatus } from '../getSmelterStatus.js';
import type { SpawnPromise } from '../spawn.js';
import { spawn } from '../spawn.js';
import { retry, sleep } from '../utils.js';
import { WebSocketConnection } from '../ws.js';

export type LocallySpawnedInstanceOptions = {
  port: number;
  /** Working directory for the server process. */
  workingdir?: string;
  /** Override the server launch command (default: python -m smelter_tpu.server). */
  executablePath?: string;
  enableWebRenderer?: boolean;
  /** Extra environment variables for the server process. */
  env?: Record<string, string>;
};

export default class LocallySpawnedInstanceManager implements SmelterManager {
  private port: number;
  private workingdir?: string;
  private executablePath?: string;
  private enableWebRenderer?: boolean;
  private env: Record<string, string>;
  private wsConnection: WebSocketConnection;
  private childSpawnPromise?: SpawnPromise;

  constructor(opts: LocallySpawnedInstanceOptions) {
    this.port = opts.port;
    this.workingdir = opts.workingdir;
    this.executablePath = opts.executablePath;
    this.enableWebRenderer = opts.enableWebRenderer;
    this.env = opts.env ?? {};
    this.wsConnection = new WebSocketConnection(
      `ws://127.0.0.1:${this.port}/ws`
    );
  }

  public static defaultManager(): LocallySpawnedInstanceManager {
    const port = process.env.SMELTER_API_PORT
      ? Number(process.env.SMELTER_API_PORT)
      : 8000;
    return new LocallySpawnedInstanceManager({ port });
  }

  public async setupInstance(opts: SetupInstanceOptions): Promise<void> {
    const env: Record<string, string> = {
      ...(process.env as Record<string, string>),
      SMELTER_API_PORT: String(this.port),
      SMELTER_WEB_RENDERER_ENABLE: this.enableWebRenderer ? 'true' : 'false',
      SMELTER_AHEAD_OF_TIME_PROCESSING_ENABLE: opts.aheadOfTimeProcessing
        ? 'true'
        : 'false',
      ...this.env,
    };
    const python = process.env.SMELTER_TPU_PYTHON ?? 'python3';
    const command = this.executablePath ?? python;
    const args = this.executablePath ? [] : ['-m', 'smelter_tpu.server'];

    this.childSpawnPromise = spawn(command, args, {
      env,
      cwd: this.workingdir ?? process.env.SMELTER_TPU_PATH,
      stdio: 'inherit',
    });
    this.childSpawnPromise.catch(error => {
      opts.logger.error(error, 'Smelter server exited unexpectedly');
    });

    await retry(async () => {
      await sleep(500);
      return getSmelterStatus(this);
    }, 20);

    await this.wsConnection.connect(opts.logger);
  }

  public async sendRequest(request: ApiRequest): Promise<object> {
    return sendRequest(new URL(`http://127.0.0.1:${this.port}`), request);
  }

  public async sendMultipartRequest(request: MultipartRequest): Promise<object> {
    return sendMultipartRequest(new URL(`http://127.0.0.1:${this.port}`), request);
  }

  public registerEventListener(cb: (event: unknown) => void): void {
    this.wsConnection.registerEventListener(cb);
  }

  public async terminate(): Promise<void> {
    await this.wsConnection.close();
    this.childSpawnPromise?.child.kill('SIGTERM');
  }
}
