/**
 * @smelter-tpu/smelter — React component library for the smelter-tpu
 * compositing server (public API mirrors @swmansion/smelter).
 */
export { default as View } from './components/View.js';
export type { ViewProps, ViewStyleProps } from './components/View.js';
export { default as Tiles } from './components/Tiles.js';
export type { TilesProps, TilesStyleProps } from './components/Tiles.js';
export { default as Rescaler } from './components/Rescaler.js';
export type { RescalerProps, RescalerStyleProps } from './components/Rescaler.js';
export { default as Text } from './components/Text.js';
export type { TextProps, TextStyleProps } from './components/Text.js';
export { default as InputStream } from './components/InputStream.js';
export type { InputStreamProps } from './components/InputStream.js';
export { default as Image } from './components/Image.js';
export type { ImageProps } from './components/Image.js';
export { default as Shader } from './components/Shader.js';
export type {
  ShaderProps,
  ShaderParam,
  ShaderParamStructField,
} from './components/Shader.js';
export { default as WebView } from './components/WebView.js';
export type { WebViewProps } from './components/WebView.js';
export { default as Mp4 } from './components/Mp4.js';
export type { Mp4Props } from './components/Mp4.js';
export { default as Show } from './components/Show.js';
export type { ShowProps } from './components/Show.js';
export { SlideShow, Slide } from './components/SlideShow.js';
export type { SlideShowProps, SlideProps } from './components/SlideShow.js';

export type { Transition, EasingFunction, BoxShadow } from './components/common.js';
export type { ComponentBaseProps } from './scene.js';

export {
  useInputStreams,
  useAudioInput,
  useBlockingTask,
  useAfterTimestamp,
  useCurrentTimestamp,
} from './hooks.js';

export * as Api from './api.js';
export * as Inputs from './types/input.js';
export * as Outputs from './types/output.js';
export * as Renderers from './types/resource.js';
export * as _smelterInternals from './internal.js';
