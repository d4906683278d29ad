/** HTTP transport over the browser fetch API. */
import type { ApiRequest, MultipartRequest } from '@smelter-tpu/smelter-core';

export function joinUrl(base: URL, route: string): URL {
  const url = new URL(base);
  url.pathname = `${url.pathname.replace(/\/+$/, '')}/${route.replace(/^\/+/, '')}`;
  return url;
}

export class HttpError extends Error {
  public status: number;
  public body: object;

  constructor(status: number, body: object) {
    const message = (body as { message?: string }).message ?? JSON.stringify(body);
    super(`Request failed (HTTP ${status}): ${message}`);
    this.status = status;
    this.body = body;
  }
}

export async function sendRequest(base: URL, request: ApiRequest): Promise<object> {
  const response = await fetch(joinUrl(base, request.route), {
    method: request.method,
    headers: { 'Content-Type': 'application/json', ...request.headers },
    body: request.body !== undefined ? JSON.stringify(request.body) : undefined,
  });
  const body = (await response.json().catch(() => ({}))) as object;
  if (!response.ok) {
    throw new HttpError(response.status, body);
  }
  return body;
}

export async function sendMultipartRequest(
  base: URL,
  request: MultipartRequest
): Promise<object> {
  const response = await fetch(joinUrl(base, request.route), {
    method: request.method,
    headers: request.headers,
    body: request.body,
  });
  const body = (await response.json().catch(() => ({}))) as object;
  if (!response.ok) {
    throw new HttpError(response.status, body);
  }
  return body;
}
