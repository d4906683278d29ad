/**
 * View layout component — a box that lays out static children along a
 * direction and absolutely positions offset children.
 * Wire schema: smelter_tpu/api/schema.py `View` (reference behavior:
 * smelter-render/src/scene/view_component.rs).
 */
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

/** Padding, in pixels; the combined forms stack with the per-edge ones. */
export type PaddingFields = {
  [Side in
    | 'padding'
    | 'paddingBottom'
    | 'paddingHorizontal'
    | 'paddingLeft'
    | 'paddingRight'
    | 'paddingTop'
    | 'paddingVertical']?: number;
};

export type ViewStyleProps = SizeFields &
  AbsolutePositionFields &
  BorderFields &
  PaddingFields & {
    /** (default "#00000000") Background color, "#RRGGBB[AA]" or CSS name. */
    backgroundColor?: string;
    /** How static children are laid out inside this View. */
    direction?: Api.ViewDirection;
    /** (default "hidden") What happens to content that does not fit. */
    overflow?: Api.Overflow;
  };

export type ViewProps = ComponentBaseProps & {
  /** Component styling. */
  style?: ViewStyleProps;
  /** Animation applied when the previous scene had a View with the same id. */
  transition?: Transition;
};

const View = sceneNodeFromSpec<ViewProps>('view', {
  rootFields: ['transition'],
  styleFields: [
    'backgroundColor', 'borderColor', 'borderRadius', 'borderWidth', 'bottom',
    'boxShadow', 'direction', 'height', 'left', 'overflow', 'padding',
    'paddingBottom', 'paddingHorizontal', 'paddingLeft', 'paddingRight',
    'paddingTop', 'paddingVertical', 'right', 'rotation', 'top', 'width',
  ],
  transforms: { boxShadow: intoApiBoxShadow, transition: intoApiTransition },
});

export default View;
