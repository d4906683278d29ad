/** Rescaler: resizes its single child (wire schema: Rescaler). */
import type React from 'react';
import type * as Api from '../api.js';
import type { ComponentBaseProps, SceneComponent } from '../component.js';
import { createSmelterComponent, sceneComponentIntoApi } from '../component.js';
import type { BoxShadow, Transition } from './common.js';
import { intoApiBoxShadow, intoApiTransition } from './common.js';

export type RescalerStyleProps = {
  /** (default "fit") fit letterboxes, fill crops. */
  rescaleMode?: Api.RescaleMode;
  horizontalAlign?: Api.HorizontalAlign;
  verticalAlign?: Api.VerticalAlign;
  width?: number;
  height?: number;
  top?: number;
  right?: number;
  bottom?: number;
  left?: number;
  rotation?: number;
  borderRadius?: number;
  borderWidth?: number;
  borderColor?: string;
  boxShadow?: BoxShadow[];
};

export type RescalerProps = ComponentBaseProps & {
  /** Exactly one child to rescale. */
  children: React.ReactElement | string | number;
  style?: RescalerStyleProps;
  transition?: Transition;
};

function sceneBuilder({ id, style, transition }: RescalerProps,
                      children: SceneComponent[]): Api.Component {
  if (children?.length !== 1) {
    throw new Error('Exactly one child is required for Rescaler component');
  }
  return {
    type: 'rescaler',
    id,
    child: sceneComponentIntoApi(children[0]),
    mode: style?.rescaleMode,
    horizontal_align: style?.horizontalAlign,
    vertical_align: style?.verticalAlign,
    width: style?.width,
    height: style?.height,
    top: style?.top,
    bottom: style?.bottom,
    left: style?.left,
    right: style?.right,
    rotation: style?.rotation,
    transition: transition && intoApiTransition(transition),
    border_radius: style?.borderRadius,
    border_width: style?.borderWidth,
    border_color: style?.borderColor,
    box_shadow: style?.boxShadow && intoApiBoxShadow(style.boxShadow),
  };
}

const Rescaler = createSmelterComponent<RescalerProps>(sceneBuilder);
export default Rescaler;
