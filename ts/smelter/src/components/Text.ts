/** Text component (wire schema: Text). */
import type * as Api from '../api.js';
import type { ComponentBaseProps, SceneComponent } from '../component.js';
import { createSmelterComponent, DEFAULT_FONT_SIZE } from '../component.js';

export type TextStyleProps = {
  /** Fixed width; without it the text box fits the content. */
  width?: number;
  /** Fixed height; without it the text box fits the content. */
  height?: number;
  /** (default 7682) Content-fitting upper bound when width is unset. */
  maxWidth?: number;
  /** (default 4320) Content-fitting upper bound when height is unset. */
  maxHeight?: number;
  fontSize: number;
  /** (default fontSize) Distance between successive baselines. */
  lineHeight?: number;
  /** (default "#FFFFFFFF") Text color. */
  color?: string;
  /** (default "#00000000") Background color of the text box. */
  backgroundColor?: string;
  /** (default "Verdana") Font family name. */
  fontFamily?: string;
  /** (default "normal") normal | italic | oblique. */
  fontStyle?: Api.TextStyle;
  /** (default "left") Text alignment. */
  align?: Api.HorizontalAlign;
  /** (default "none") Wrapping: none | glyph | word. */
  wrap?: Api.TextWrapMode;
  /** (default "normal") Font weight. */
  fontWeight?: Api.TextWeight;
};

export type TextProps = ComponentBaseProps & {
  children?: (string | number)[] | string | number;
  style?: TextStyleProps;
};

function sceneBuilder({ id, style }: TextProps,
                      children: SceneComponent[]): Api.Component {
  return {
    type: 'text',
    id,
    text: children
      .map(child => (typeof child === 'string' ? child : String(child)))
      .join(''),
    width: style?.width,
    height: style?.height,
    max_width: style?.maxWidth,
    max_height: style?.maxHeight,
    font_size: style?.fontSize ?? DEFAULT_FONT_SIZE,
    line_height: style?.lineHeight,
    color: style?.color,
    background_color: style?.backgroundColor,
    font_family: style?.fontFamily,
    style: style?.fontStyle,
    align: style?.align,
    wrap: style?.wrap,
    weight: style?.fontWeight,
  };
}

const Text = createSmelterComponent<TextProps>(sceneBuilder);
export default Text;
