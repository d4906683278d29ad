/**
 * Text — renders its string children through the server-side text shaper.
 * Wire schema: smelter_tpu/api/schema.py `Text` (reference behavior:
 * smelter-render/src/transformations/text_renderer.rs).
 */
import type * as Api from '../api.js';
import type { ComponentBaseProps } from '../scene.js';
import { DEFAULT_FONT_SIZE, sceneNodeFromSpec } from '../scene.js';

export type TextStyleProps = {
  /** (default "left") Text alignment. */
  align?: Api.HorizontalAlign;
  /** (default "#00000000") Background color of the text box. */
  backgroundColor?: string;
  /** (default "#FFFFFFFF") Text color. */
  color?: string;
  /** (default "Verdana") Font family name. */
  fontFamily?: string;
  fontSize: number;
  /** (default "normal") normal | italic | oblique. */
  fontStyle?: Api.TextStyle;
  /** (default "normal") Font weight. */
  fontWeight?: Api.TextWeight;
  /** Fixed height; without it the text box fits the content. */
  height?: number;
  /** (default fontSize) Distance between successive baselines. */
  lineHeight?: number;
  /** (default 4320) Content-fitting upper bound when height is unset. */
  maxHeight?: number;
  /** (default 7682) Content-fitting upper bound when width is unset. */
  maxWidth?: number;
  /** Fixed width; without it the text box fits the content. */
  width?: number;
  /** (default "none") Wrapping: none | glyph | word. */
  wrap?: Api.TextWrapMode;
};

export type TextProps = ComponentBaseProps & {
  children?: (string | number)[] | string | number;
  style?: TextStyleProps;
};

const Text = sceneNodeFromSpec<TextProps>('text', {
  childSlot: 'join',
  styleFields: [
    'align', 'backgroundColor', 'color', 'fontFamily', 'fontSize',
    'fontStyle', 'fontWeight', 'height', 'lineHeight', 'maxHeight',
    'maxWidth', 'width', 'wrap',
  ],
  aliases: { fontStyle: 'style', fontWeight: 'weight' },
  defaults: { font_size: DEFAULT_FONT_SIZE },
});

export default Text;
