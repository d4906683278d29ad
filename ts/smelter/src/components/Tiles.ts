/** Tiles grid layout (wire schema: smelter_tpu/api/schema.py Tiles). */
import type * as Api from '../api.js';
import type { ComponentBaseProps, SceneComponent } from '../component.js';
import { createSmelterComponent, sceneComponentIntoApi } from '../component.js';
import type { Transition } from './common.js';
import { intoApiTransition } from './common.js';

export type TilesStyleProps = {
  width?: number;
  height?: number;
  /** (default "#00000000") Background color. */
  backgroundColor?: string;
  /** (default "16:9") Aspect ratio of every tile, "W:H". */
  tileAspectRatio?: Api.AspectRatio | null;
  /** (default 0) Gap between tiles and the component edge. */
  margin?: number;
  /** (default 0) Gap between neighboring tiles. */
  padding?: number;
  /** (default "center") Horizontal alignment of an incomplete tile row. */
  horizontalAlign?: Api.HorizontalAlign;
  /** (default "center") Vertical alignment of the tile grid. */
  verticalAlign?: Api.VerticalAlign;
};

export type TilesProps = ComponentBaseProps & {
  style?: TilesStyleProps;
  /** Tile re-layout animation on scene update (requires a stable id). */
  transition?: Transition;
};

function sceneBuilder({ id, style, transition }: TilesProps,
                      children: SceneComponent[]): Api.Component {
  return {
    type: 'tiles',
    id,
    children: children.map(sceneComponentIntoApi),
    width: style?.width,
    height: style?.height,
    background_color: style?.backgroundColor,
    tile_aspect_ratio: style?.tileAspectRatio ?? undefined,
    margin: style?.margin,
    padding: style?.padding,
    horizontal_align: style?.horizontalAlign,
    vertical_align: style?.verticalAlign,
    transition: transition && intoApiTransition(transition),
  };
}

const Tiles = createSmelterComponent<TilesProps>(sceneBuilder);
export default Tiles;
