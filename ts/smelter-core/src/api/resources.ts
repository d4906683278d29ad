/** Image / web-renderer registration converters (camelCase -> wire). */
import type { Api, Renderers } from '@smelter-tpu/smelter';

/** Copy `source` fields through a prop→wire-key table, dropping undefined. */
function remap<T>(source: Record<string, unknown>, table: Record<string, string>): T {
  const out: Record<string, unknown> = {};
  for (const [prop, key] of Object.entries(table)) {
    if (source[prop] !== undefined) out[key] = source[prop];
  }
  return out as T;
}

export function intoRegisterImage(image: Renderers.RegisterImage): Api.ImageSpec {
  return remap<Api.ImageSpec>(image as Record<string, unknown>, {
    assetType: 'asset_type',
    url: 'url',
    serverPath: 'path',
    resolution: 'resolution',
  });
}

export function intoRegisterWebRenderer(
  renderer: Renderers.RegisterWebRenderer
): Api.WebRendererSpec {
  return remap<Api.WebRendererSpec>(renderer as Record<string, unknown>, {
    url: 'url',
    resolution: 'resolution',
    embeddingMethod: 'embedding_method',
  });
}
