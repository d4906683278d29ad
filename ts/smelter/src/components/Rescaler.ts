/**
 * Rescaler — resizes its single child to fit, preserving aspect ratio.
 * Wire schema: smelter_tpu/api/schema.py `Rescaler` (reference behavior:
 * smelter-render/src/scene/rescaler_component.rs).
 */
import type React from 'react';
import type * as Api from '../api.js';
import type { ComponentBaseProps } from '../scene.js';
import { sceneNodeFromSpec } from '../scene.js';
import type {
  AbsolutePositionFields,
  BorderFields,
  SizeFields,
  Transition,
} from './common.js';
import { intoApiBoxShadow, intoApiTransition } from './common.js';

export type RescalerStyleProps = SizeFields &
  AbsolutePositionFields &
  BorderFields & {
    /** (default "center") Placement of a child narrower than the box. */
    horizontalAlign?: Api.HorizontalAlign;
    /** (default "fit") fit letterboxes, fill crops. */
    rescaleMode?: Api.RescaleMode;
    /** (default "center") Placement of a child shorter than the box. */
    verticalAlign?: Api.VerticalAlign;
  };

export type RescalerProps = ComponentBaseProps & {
  /** Exactly one child to rescale. */
  children: React.ReactElement | string | number;
  style?: RescalerStyleProps;
  transition?: Transition;
};

const Rescaler = sceneNodeFromSpec<RescalerProps>('rescaler', {
  childSlot: 'one',
  rootFields: ['transition'],
  styleFields: [
    'borderColor', 'borderRadius', 'borderWidth', 'bottom', 'boxShadow',
    'height', 'horizontalAlign', 'left', 'rescaleMode', 'right', 'rotation',
    'top', 'verticalAlign', 'width',
  ],
  aliases: { rescaleMode: 'mode' },
  transforms: { boxShadow: intoApiBoxShadow, transition: intoApiTransition },
});

export default Rescaler;
