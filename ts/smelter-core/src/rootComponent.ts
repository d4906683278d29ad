/**
 * Root element wrapped around every output's user tree: provides the
 * SmelterContext + ChildrenLifetimeContext, and holds offline outputs open
 * for a minimal 1 s so empty scenes still produce a stream.
 */
import { _smelterInternals, useAfterTimestamp } from '@smelter-tpu/smelter';
import { createElement, useEffect, type ReactElement } from 'react';

type SmelterOutputContext = _smelterInternals.SmelterOutputContext;
type ChildrenLifetimeContext = _smelterInternals.ChildrenLifetimeContext;

const globalDelayRef = Symbol();

export function OutputRootComponent({
  outputContext,
  outputRoot,
  childrenLifetimeContext,
}: {
  outputContext: SmelterOutputContext;
  outputRoot: ReactElement;
  childrenLifetimeContext: ChildrenLifetimeContext;
}) {
  useMinimalStreamDuration(childrenLifetimeContext);
  return createElement(
    _smelterInternals.SmelterContext.Provider,
    { value: outputContext },
    createElement(
      _smelterInternals.ChildrenLifetimeContextType.Provider,
      { value: childrenLifetimeContext },
      outputRoot
    )
  );
}

function useMinimalStreamDuration(lifetimeCtx: ChildrenLifetimeContext): void {
  useEffect(() => {
    lifetimeCtx.removeRef(globalDelayRef);
    return () => lifetimeCtx.removeRef(globalDelayRef);
  }, []);
  const after = useAfterTimestamp(1000);
  useEffect(() => {
    if (after) {
      lifetimeCtx.removeRef(globalDelayRef);
    }
  }, [after]);
}
