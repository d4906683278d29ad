/**
 * Wire API types. Everything here is generated from the server's pydantic
 * schema (smelter_tpu/api/schema.py) — see tools/generate_ts_types.py.
 */
export * from './api.generated.js';

// Convenience aliases matching the reference api.ts naming
// (ts/smelter/src/api.ts).
export type AspectRatio = string; // "W:H"
export type ViewDirection = 'row' | 'column';
export type Overflow = 'visible' | 'hidden' | 'fit';
export type RescaleMode = 'fit' | 'fill';
export type HorizontalAlign = 'left' | 'right' | 'center' | 'justified';
export type VerticalAlign = 'top' | 'center' | 'bottom' | 'justified';
export type TextStyle = 'normal' | 'italic' | 'oblique';
export type TextWrapMode = 'none' | 'glyph' | 'word';
export type TextWeight =
  | 'thin'
  | 'extra_light'
  | 'light'
  | 'normal'
  | 'medium'
  | 'semi_bold'
  | 'bold'
  | 'extra_bold'
  | 'black';
