/**
 * Renderer-resource registration types (shaders / images / web renderer
 * instances), the camelCase side of api.{ShaderSpec,ImageSpec,
 * WebRendererSpec}.
 */
import type * as Api from '../api.js';

/** Shader source registered by id (the server validates at registration). */
export type RegisterShader = Api.ShaderSpec;

export const imageAssetTypes = ['png', 'jpeg', 'svg', 'gif', 'auto'] as const;
export type ImageAssetType = (typeof imageAssetTypes)[number];

export type RegisterImage = {
  /** (default "auto": sniffed from the payload) Asset decoder to use. */
  assetType: ImageAssetType;
  /** HTTP(S) source (mutually exclusive with serverPath). */
  url?: string;
  /** Path on the server host. */
  serverPath?: string;
  /** SVG raster size. */
  resolution?: Api.Resolution;
};

export type WebEmbeddingMethod =
  | 'chromium_embedding'
  | 'native_embedding_over_content'
  | 'native_embedding_under_content';

export type RegisterWebRenderer = {
  /** Page to load in the sidecar browser. */
  url: string;
  /** Page viewport / output texture size. */
  resolution: Api.Resolution;
  /** (default "chromium_embedding") How child frames reach the page. */
  embeddingMethod?: WebEmbeddingMethod;
};
