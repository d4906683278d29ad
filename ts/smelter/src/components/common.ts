/**
 * Shared style types + camelCase -> wire snake_case converters
 * (reference ts/smelter/src/components/common.ts).
 */
import type * as Api from '../api.js';

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

export function intoApiTransition(transition: Transition): Api.Transition {
  return {
    duration_ms: transition.durationMs,
    easing_function: transition.easingFunction
      ? intoApiEasingFunction(transition.easingFunction)
      : undefined,
    should_interrupt: transition.shouldInterrupt,
  };
}

export function intoApiEasingFunction(easing: EasingFunction): Api.EasingFunction {
  if (typeof easing === 'string') {
    if (easing !== 'linear' && easing !== 'bounce') {
      throw new Error(`Invalid Smelter.EasingFunction "${easing}"`);
    }
    return { function_name: easing };
  }
  if (easing.functionName === 'cubic_bezier') {
    return { function_name: 'cubic_bezier', points: easing.points };
  }
  if (easing.functionName === 'linear' || easing.functionName === 'bounce') {
    return { function_name: easing.functionName };
  }
  throw new Error(`Invalid Smelter.EasingFunction ${JSON.stringify(easing)}`);
}

export function intoApiBoxShadow(shadows: BoxShadow[]): Api.BoxShadow[] {
  return shadows.map(shadow => ({
    offset_x: shadow.offsetX ?? undefined,
    offset_y: shadow.offsetY ?? undefined,
    color: shadow.color ?? undefined,
    blur_radius: shadow.blurRadius ?? undefined,
  }));
}
