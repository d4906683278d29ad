/**
 * Tiles — packs children into an optimal equal-size grid.
 * Wire schema: smelter_tpu/api/schema.py `Tiles` (reference behavior:
 * smelter-render/src/scene/tiles_component.rs).
 */
import type * as Api from '../api.js';
import type { ComponentBaseProps } from '../scene.js';
import { sceneNodeFromSpec } from '../scene.js';
import type { Transition } from './common.js';
import { intoApiTransition } from './common.js';

export type TilesStyleProps = {
  /** (default "#00000000") Background color. */
  backgroundColor?: string;
  height?: number;
  /** (default "center") Horizontal alignment of an incomplete tile row. */
  horizontalAlign?: Api.HorizontalAlign;
  /** (default 0) Gap between tiles and the component edge. */
  margin?: number;
  /** (default 0) Gap between neighboring tiles. */
  padding?: number;
  /** (default "16:9") Aspect ratio of every tile, "W:H". */
  tileAspectRatio?: Api.AspectRatio | null;
  /** (default "center") Vertical alignment of the tile grid. */
  verticalAlign?: Api.VerticalAlign;
  width?: number;
};

export type TilesProps = ComponentBaseProps & {
  style?: TilesStyleProps;
  /** Tile re-layout animation on scene update (requires a stable id). */
  transition?: Transition;
};

const Tiles = sceneNodeFromSpec<TilesProps>('tiles', {
  rootFields: ['transition'],
  styleFields: [
    'backgroundColor', 'height', 'horizontalAlign', 'margin', 'padding',
    'tileAspectRatio', 'verticalAlign', 'width',
  ],
  transforms: { transition: intoApiTransition },
});

export default Tiles;
