/** View layout component (wire schema: smelter_tpu/api/schema.py View). */
import type * as Api from '../api.js';
import type { ComponentBaseProps, SceneComponent } from '../component.js';
import { createSmelterComponent, sceneComponentIntoApi } from '../component.js';
import type { BoxShadow, Transition } from './common.js';
import { intoApiBoxShadow, intoApiTransition } from './common.js';

export type ViewStyleProps = {
  /** Width of the component in pixels. */
  width?: number;
  /** Height of the component in pixels. */
  height?: number;
  /** How static children are laid out inside this View. */
  direction?: Api.ViewDirection;
  /** Absolute offset from the parent's top edge (switches to absolute positioning). */
  top?: number;
  /** Absolute offset from the parent's right edge. */
  right?: number;
  /** Absolute offset from the parent's bottom edge. */
  bottom?: number;
  /** Absolute offset from the parent's left edge. */
  left?: number;
  /** Rotation in degrees (absolute positioning). */
  rotation?: number;
  /** (default "hidden") What happens to content that does not fit. */
  overflow?: Api.Overflow;
  /** (default "#00000000") Background color, "#RRGGBB[AA]" or CSS name. */
  backgroundColor?: string;
  /** (default 0) Corner radius. */
  borderRadius?: number;
  /** (default 0) Border width. */
  borderWidth?: number;
  /** (default "#00000000") Border color. */
  borderColor?: string;
  /** Box shadows under this component. */
  boxShadow?: BoxShadow[];
  /** Padding on every side. */
  padding?: number;
  /** Padding top+bottom. */
  paddingVertical?: number;
  /** Padding left+right. */
  paddingHorizontal?: number;
  paddingTop?: number;
  paddingRight?: number;
  paddingBottom?: number;
  paddingLeft?: number;
};

export type ViewProps = ComponentBaseProps & {
  /** Component styling. */
  style?: ViewStyleProps;
  /** Animation applied when the previous scene had a View with the same id. */
  transition?: Transition;
};

function sceneBuilder({ id, style = {}, transition }: ViewProps,
                      children: SceneComponent[]): Api.Component {
  return {
    type: 'view',
    id,
    children: children.map(sceneComponentIntoApi),
    width: style.width,
    height: style.height,
    direction: style.direction,
    top: style.top,
    right: style.right,
    bottom: style.bottom,
    left: style.left,
    rotation: style.rotation,
    overflow: style.overflow,
    background_color: style.backgroundColor,
    transition: transition && intoApiTransition(transition),
    border_radius: style.borderRadius,
    border_width: style.borderWidth,
    border_color: style.borderColor,
    box_shadow: style.boxShadow && intoApiBoxShadow(style.boxShadow),
    padding: style.padding,
    padding_vertical: style.paddingVertical,
    padding_horizontal: style.paddingHorizontal,
    padding_top: style.paddingTop,
    padding_bottom: style.paddingBottom,
    padding_right: style.paddingRight,
    padding_left: style.paddingLeft,
  };
}

const View = createSmelterComponent<ViewProps>(sceneBuilder);
export default View;
