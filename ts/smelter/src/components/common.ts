/**
 * Style fragments and camelCase→wire converters shared by the layout
 * components (wire schema: smelter_tpu/api/schema.py Transition/BoxShadow).
 */
import type * as Api from '../api.js';
import { wireKey } from '../scene.js';

/** Sizing accepted by every layout component. */
export type SizeFields = {
  width?: number;
  height?: number;
};

/** Setting any of these switches the component to absolute positioning. */
export type AbsolutePositionFields = {
  [Edge in 'bottom' | 'left' | 'right' | 'top']?: number;
} & {
  /** Rotation in degrees around the component center. */
  rotation?: number;
};

/** Border + drop-shadow styling shared by View and Rescaler. */
export type BorderFields = {
  /** (default "#00000000") Border color. */
  borderColor?: string;
  /** (default 0) Corner radius. */
  borderRadius?: number;
  /** (default 0) Border width. */
  borderWidth?: number;
  /** Box shadows under this component. */
  boxShadow?: BoxShadow[];
};

export interface Transition {
  /** Duration of a transition in milliseconds. */
  durationMs: number;
  /** (default "linear") Easing function used for the transition. */
  easingFunction?: EasingFunction | null;
  /**
   * (default false) If a transition is already running when the scene
   * updates, interrupt it and start the new one from the current state.
   */
  shouldInterrupt?: boolean;
}

export type EasingFunction =
  | 'linear'
  | 'bounce'
  | { functionName: 'linear' }
  | { functionName: 'bounce' }
  | { functionName: 'cubic_bezier'; points: [number, number, number, number] };

export interface BoxShadow {
  offsetX?: number | null;
  offsetY?: number | null;
  color?: string | null;
  blurRadius?: number | null;
}

/** Generic camelCase→snake_case record rewrite, dropping null/undefined. */
function snakeCased<T>(value: Record<string, unknown>): T {
  const out: Record<string, unknown> = {};
  for (const [key, field] of Object.entries(value)) {
    if (field !== undefined && field !== null) out[wireKey(key)] = field;
  }
  return out as T;
}

export function intoApiEasingFunction(easing: EasingFunction): Api.EasingFunction {
  const name = typeof easing === 'string' ? easing : easing.functionName;
  switch (name) {
    case 'linear':
    case 'bounce':
      return { function_name: name };
    case 'cubic_bezier':
      return {
        function_name: name,
        points: (easing as { points: [number, number, number, number] }).points,
      };
    default:
      throw new Error(`Invalid Smelter.EasingFunction ${JSON.stringify(easing)}`);
  }
}

export function intoApiTransition(transition: Transition): Api.Transition {
  return snakeCased<Api.Transition>({
    durationMs: transition.durationMs,
    easingFunction: transition.easingFunction
      ? intoApiEasingFunction(transition.easingFunction)
      : undefined,
    shouldInterrupt: transition.shouldInterrupt,
  });
}

export function intoApiBoxShadow(shadows: BoxShadow[]): Api.BoxShadow[] {
  return shadows.map(shadow => snakeCased<Api.BoxShadow>(shadow as Record<string, unknown>));
}
