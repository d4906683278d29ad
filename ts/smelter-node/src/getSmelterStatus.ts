/**
 * Typed wrapper over GET /status. The response is camelized generically —
 * the wire/TS key relationship is mechanical (snake_case <-> camelCase),
 * so no per-field copying.
 */
import type { SmelterManager } from '@smelter-tpu/smelter-core';

export type SmelterStatus = {
  instanceId: string;
  configuration: {
    apiPort: number;
    outputFramerate: number;
    mixingSampleRate: number;
    aheadOfTimeProcessing: boolean;
    neverDropOutputFrames: boolean;
    runLateScheduledEvents: boolean;
    downloadRoot: string;
    webRendererEnable: boolean;
    whipWhepServerPort: number;
    whipWhepEnable: boolean;
    renderingMode: string;
  };
  inputs: Array<{ inputId: string; inputType: string }>;
  outputs: Array<{ outputId: string; outputType: string }>;
};

/** Deep snake_case→camelCase key rewrite of a JSON value. */
export function camelized<T>(value: unknown): T {
  if (Array.isArray(value)) {
    return value.map(item => camelized(item)) as T;
  }
  if (value !== null && typeof value === 'object') {
    const out: Record<string, unknown> = {};
    for (const [key, field] of Object.entries(value)) {
      out[key.replace(/_([a-z0-9])/g, (_, ch: string) => ch.toUpperCase())] =
        camelized(field);
    }
    return out as T;
  }
  return value as T;
}

export async function getSmelterStatus(manager: SmelterManager): Promise<SmelterStatus> {
  const raw = await manager.sendRequest({ method: 'GET', route: '/status' });
  return camelized<SmelterStatus>(raw);
}
