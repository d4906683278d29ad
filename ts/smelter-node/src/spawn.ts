/** Child-process helper: spawn a command and resolve/reject on exit. */
import type { ChildProcess, SpawnOptions } from 'child_process';
import { spawn as nodeSpawn } from 'child_process';

export interface SpawnPromise extends Promise<void> {
  child: ChildProcess;
}

export function spawn(
  command: string,
  args: string[],
  options: SpawnOptions
): SpawnPromise {
  const child = nodeSpawn(command, args, options);
  const promise = new Promise<void>((resolve, reject) => {
    child.on('exit', (code: number | null) => {
      if (code === 0 || code === null) {
        resolve();
      } else {
        reject(new Error(`Command "${command}" failed with exit code ${code}.`));
      }
    });
    child.on('error', (error: unknown) => reject(error));
  }) as SpawnPromise;
  promise.child = child;
  return promise;
}
