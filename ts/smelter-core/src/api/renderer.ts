/** Shader/image/web-renderer registration converters. */
import type { Api, Renderers } from '@smelter-tpu/smelter';

export function intoRegisterImage(image: Renderers.RegisterImage): Api.ImageSpec {
  return {
    asset_type: image.assetType,
    url: image.url,
    path: image.serverPath,
    resolution: image.resolution,
  } as Api.ImageSpec;
}

export function intoRegisterWebRenderer(
  renderer: Renderers.RegisterWebRenderer
): Api.WebRendererSpec {
  return {
    url: renderer.url,
    resolution: renderer.resolution,
    embedding_method: renderer.embeddingMethod,
  } as Api.WebRendererSpec;
}
