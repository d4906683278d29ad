/**
 * Content-lifetime plumbing: the keep-alive scope components report into,
 * the retain hooks, and the shell element output drivers mount around the
 * user's tree.
 */
import { createContext, createElement, useContext, useEffect, useState } from 'react';
import type React from 'react';
import { useAfterTimestamp } from './hooks.js';
import type { OutputRuntime } from './runtime.js';
import { KeepAlive, RuntimeContext } from './runtime.js';

/**
 * The keep-alive scope in effect for this part of the tree. Defaults to
 * the output's own scope; <SlideShow/> narrows it per slide.
 */
export const ScopeContext = createContext<KeepAlive>(new KeepAlive());

/** Hold the surrounding scope open until the timeline passes `untilMs`. */
export function useRetainUntil(untilMs: number): void {
  const scope = useContext(ScopeContext);
  const passed = useAfterTimestamp(untilMs);
  useEffect(() => {
    if (passed) {
      return;
    }
    return scope.retain();
  }, [scope, untilMs, passed]);
}

/** Hold the surrounding scope open while `pending` is true. */
export function useRetainWhile(pending: boolean): void {
  const scope = useContext(ScopeContext);
  useEffect(() => {
    if (!pending) {
      return;
    }
    return scope.retain();
  }, [scope, pending]);
}

/** Timestamp of mount on the output timeline. */
export function useMountTimestamp(): number {
  const runtime = useRuntime_();
  const [mountMs] = useState(() => runtime.clock.now());
  return mountMs;
}

function useRuntime_(): OutputRuntime {
  return useContext(RuntimeContext);
}

/** An empty scene still produces this much output (ms). */
const MINIMUM_OUTPUT_MS = 1000;

function MinimumDuration(): React.ReactNode {
  useRetainUntil(MINIMUM_OUTPUT_MS);
  return null;
}

/**
 * Shell mounted by output drivers around the user's root element: provides
 * the runtime + the output-level keep-alive scope, and holds the output
 * open for the first second of the timeline.
 */
export function OutputShell(props: {
  runtime: OutputRuntime;
  children: React.ReactNode;
}): React.ReactNode {
  return createElement(
    RuntimeContext.Provider,
    { value: props.runtime },
    createElement(
      ScopeContext.Provider,
      { value: props.runtime.keepAlive },
      createElement(MinimumDuration, null),
      props.children
    )
  );
}
